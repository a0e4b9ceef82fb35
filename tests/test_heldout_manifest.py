"""Fast-tier guard for the committed held-out corpus (VERDICT r5 item 2).

Round 4 shipped every "held-out" accuracy claim against a corpus that was
never actually in the repository (an unanchored `data/` gitignore pattern
swallowed tests/data/). This guard makes that failure mode impossible to
repeat silently: it fails in seconds — in the FAST tier — if the corpus
files are missing, truncated, or drift from the committed md5 manifest
that `python -m audiotabs_tpu.train.make_heldout` regenerates
byte-identically.
"""

import hashlib
import json
from pathlib import Path

HELD = Path(__file__).resolve().parent / "data" / "heldout"
CLIP_NAMES = (
    "fingerpick", "picked_melody", "waltz_fingerpick", "strum_band", "barre_band", "vocal_band",
)


def _manifest() -> dict[str, str]:
    lines = (HELD / "MANIFEST.md5").read_text().splitlines()
    return {l.split(maxsplit=1)[1].strip(): l.split(maxsplit=1)[0] for l in lines if l.strip()}


def test_corpus_files_committed_and_exact():
    """Every WAV + ground-truth JSON exists and matches the manifest md5."""
    manifest = _manifest()
    expected = {f"heldout_{n}.wav" for n in CLIP_NAMES} | {f"heldout_{n}.json" for n in CLIP_NAMES}
    assert set(manifest) == expected, sorted(set(manifest) ^ expected)
    for fname, md5 in manifest.items():
        p = HELD / fname
        assert p.exists(), f"missing corpus file {fname} — run python -m audiotabs_tpu.train.make_heldout"
        actual = hashlib.md5(p.read_bytes()).hexdigest()
        assert actual == md5, f"{fname} drifted from the committed manifest ({actual} != {md5})"


def test_ground_truth_schema():
    """Ground truth carries exact beats/chords/notes/key and the generator version."""
    from audiotabs_tpu.train.make_heldout import HELDOUT_VERSION

    for n in CLIP_NAMES:
        gt = json.loads((HELD / f"heldout_{n}.json").read_text())
        assert gt["generator_version"] == HELDOUT_VERSION, n
        assert isinstance(gt["band"], bool), n
        assert len(gt["beats"]) >= 24, n
        assert all(b2 > b1 for b1, b2 in zip(gt["beats"], gt["beats"][1:])), n
        assert gt["chords"][0]["start"] == gt["beats"][0], n
        for c in gt["chords"]:
            assert 0 <= c["root_pc"] < 12 and c["quality"] in ("maj", "min"), (n, c)
            assert c["end"] > c["start"], (n, c)
        assert len(gt["notes"]) >= 40, n
        for ev in gt["notes"][:5]:
            assert ev["end"] > ev["start"] >= 0 and 28 <= ev["pitch"] <= 96, (n, ev)
        assert gt["key"]["mode"] in ("major", "minor") and 0 <= gt["key"]["tonic_pc"] < 12, n


def test_band_flags_route_stem_evaluation():
    """The trainers' guitar-stem evaluation path keys off the band flag."""
    flags = {n: json.loads((HELD / f"heldout_{n}.json").read_text())["band"] for n in CLIP_NAMES}
    assert flags == {
        "fingerpick": False,
        "picked_melody": False,
        "waltz_fingerpick": False,
        "strum_band": True,
        "barre_band": True,
        "vocal_band": True,
    }
