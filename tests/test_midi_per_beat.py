import struct

from audiotabs_tpu.score import Segment, export_chords_midi


def _count_note_ons(data: bytes) -> int:
    """Count 0x9n events with velocity > 0 (crude but sufficient: our writer
    emits no running status)."""
    count = 0
    i = 0
    while i < len(data) - 2:
        if data[i] == 0x90 and data[i + 2] > 0:
            count += 1
        i += 1
    return count


def test_per_beat_restrikes_each_beat(tmp_path):
    p = tmp_path / "pb.mid"
    beats = [0.0, 0.5, 1.0, 1.5]
    export_chords_midi(
        p, [Segment(0.0, 2.0, "C:maj", 0.9)], tempo_bpm=120.0, beat_times=beats, per_beat=True
    )
    data = p.read_bytes()
    assert data[:4] == b"MThd"
    # 4 strikes x 3 triad tones = 12 note-ons
    assert _count_note_ons(data) == 12


def test_sustained_single_voicing(tmp_path):
    p = tmp_path / "sus.mid"
    export_chords_midi(p, [Segment(0.0, 2.0, "C:maj", 0.9)], tempo_bpm=120.0)
    assert _count_note_ons(p.read_bytes()) == 3


def test_slash_bass_velocity_accent(tmp_path):
    p = tmp_path / "bass.mid"
    export_chords_midi(p, [Segment(0.0, 1.0, "C:maj/G", 0.9)], tempo_bpm=120.0)
    data = p.read_bytes()
    # find velocities of note-on events
    vels = [data[i + 2] for i in range(len(data) - 2) if data[i] == 0x90 and data[i + 2] > 0]
    assert 80 in vels and 72 in vels
