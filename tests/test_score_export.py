import struct
import xml.etree.ElementTree as ET

from audiotabs_tpu.schemas import ScoreData, ScoreItem, ScoreMeasure
from audiotabs_tpu.score import (
    Segment,
    export_chords_midi,
    export_musicxml,
    save_note_events_csv,
    write_midi_from_note_events,
    write_midi_from_score,
)
from audiotabs_tpu.theory.events import NoteEvent


def _demo_score():
    return ScoreData(
        grid_q=0.25,
        grid_kind="straight",
        measures=[
            ScoreMeasure(
                number=1,
                items=[
                    ScoreItem(keys=["c/4"], duration="q"),
                    ScoreItem(keys=["e/4", "g/4"], duration="q"),
                    ScoreItem(rest=True, keys=[], duration="h"),
                ],
            )
        ],
    )


def test_musicxml_structure(tmp_path):
    p = tmp_path / "out.musicxml"
    export_musicxml(
        p,
        _demo_score(),
        tempo_bpm=100.0,
        key_signature_fifths=1,
        instrument="guitar",
        chords=[Segment(0.0, 2.0, "G:maj", 0.9)],
        tab_positions=[[[(5, 3)], [(4, 2), (3, 0)], []]],
    )
    tree = ET.parse(p)
    root = tree.getroot()
    assert root.tag == "score-partwise"
    parts = root.findall("part")
    assert len(parts) == 2  # notation + TAB
    notes = parts[0].findall("measure/note")
    assert len(notes) == 4  # c, e, g(chord), rest
    assert notes[2].find("chord") is not None
    assert notes[3].find("rest") is not None
    # harmony present
    assert parts[0].find("measure/harmony/root/root-step").text == "G"
    # TAB technicals
    tech = parts[1].findall("measure/note/notations/technical")
    assert tech and tech[0].find("string").text == "5"
    assert tech[0].find("fret").text == "3"
    # fifths
    assert parts[0].find("measure/attributes/key/fifths").text == "1"
    # tab staff has 6 lines
    assert parts[1].find("measure/attributes/staff-details/staff-lines").text == "6"


def test_midi_from_score(tmp_path):
    p = tmp_path / "out.mid"
    write_midi_from_score(p, _demo_score(), tempo_bpm=100.0)
    data = p.read_bytes()
    assert data[:4] == b"MThd"
    (hlen, fmt, ntrk, ppq) = struct.unpack(">IHHH", data[4:14])
    assert fmt == 1 and ntrk == 2 and ppq == 480
    assert b"MTrk" in data


def test_midi_from_events_and_chords(tmp_path):
    evs = [NoteEvent(0.0, 0.5, 60), NoteEvent(0.5, 1.0, 64)]
    p1 = tmp_path / "n.mid"
    write_midi_from_note_events(p1, evs, tempo_bpm=120.0)
    assert p1.read_bytes()[:4] == b"MThd"
    p2 = tmp_path / "c.mid"
    export_chords_midi(p2, [Segment(0.0, 1.0, "C:maj", 0.5), Segment(1.0, 2.0, "N", 0.1)])
    assert p2.read_bytes()[:4] == b"MThd"


def test_csv_matches_reference_format(tmp_path):
    evs = [NoteEvent(2.2, 2.371, 50, 90, 1.0)]
    p = tmp_path / "ne.csv"
    save_note_events_csv(evs, p)
    lines = p.read_text().strip().split("\n")
    assert lines[0] == "start_time_s,end_time_s,pitch_midi,velocity,amplitude"
    assert lines[1] == "2.200000,2.371000,50,90,1.000000"


def test_pdf_lead_sheet(tmp_path):
    """The LilyPond-free PDF engraver (score/pdfwriter.py): valid PDF
    structure, one page for a short progression, multi-page for a long one,
    chord symbols present as text operators."""
    from audiotabs_tpu.schemas import ChordSegment, KeySignature
    from audiotabs_tpu.score.pdfwriter import build_pdf_lead_sheet, render_pdf_lead_sheet

    ks = KeySignature(
        tonic="G", mode="major", fifths=1, name="G major", vexflow="G",
        use_flats=False, score=1.0,
    )
    chords = [
        ChordSegment(start=4.0 * i, end=4.0 * (i + 1), label=l, confidence=0.9)
        for i, l in enumerate(["G:maj", "D:maj", "A:min", "C:maj"] * 5)
    ]
    data = build_pdf_lead_sheet(chords, tempo_bpm=68.0, title="t", key_signature=ks)
    assert data.startswith(b"%PDF")
    assert data.count(b"/Type /Page ") == 1
    assert b"(G) Tj" in data and b"(Am) Tj" in data  # chord symbols drawn

    # xref offsets must point at the objects they claim
    import re

    xref_at = int(data.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert data[xref_at : xref_at + 4] == b"xref"
    n = int(re.search(rb"xref\n0 (\d+)\n", data[xref_at:]).group(1))
    table = xref_at + re.search(rb"xref\n0 \d+\n", data[xref_at:]).end()
    for i in range(1, n):
        off = int(data[table + 20 * i : table + 20 * i + 10])
        assert data[off:].startswith(f"{i} 0 obj".encode())

    # long progression → multiple pages
    long_chords = [
        ChordSegment(start=4.0 * i, end=4.0 * (i + 1), label="G:maj", confidence=0.9)
        for i in range(80)
    ]
    data2 = build_pdf_lead_sheet(long_chords, tempo_bpm=120.0, title="t2")
    assert data2.count(b"/Type /Page ") >= 2

    p = tmp_path / "score.pdf"
    assert render_pdf_lead_sheet(p, chords, tempo_bpm=68.0)
    assert p.read_bytes().startswith(b"%PDF")
