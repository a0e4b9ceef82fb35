import numpy as np
import pytest

from audiotabs_tpu.io import write_wav


@pytest.fixture(scope="module")
def song_files(tmp_path_factory):
    """8 short songs with distinct tonic chords."""
    sr = 22050
    root_dir = tmp_path_factory.mktemp("songs")
    paths = []
    rng = np.random.default_rng(0)
    for i in range(8):
        root = 48 + i  # C3..G3 chord roots
        t = np.arange(sr * 2) / sr
        y = sum(
            0.25 * np.sin(2 * np.pi * 440 * 2 ** ((p - 69) / 12) * t)
            for p in (root, root + 4, root + 7)
        )
        for k in range(0, len(y) - 300, sr // 2):
            y[k : k + 300] += 0.2 * rng.standard_normal(300)
        p = root_dir / f"song{i}.wav"
        write_wav(p, np.asarray(y, dtype=np.float32), sr)
        paths.append(p)
    return paths


def test_batch_transcription_sharded(song_files, tmp_path, monkeypatch):
    monkeypatch.setenv("TRANSCRIPTION_MODE", "notes")
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "2")
    # sharding-mechanics test: pin the weight-free HPSS path (64 htdemucs
    # forwards are too slow for the CPU mesh; see test_batch_with_separation)
    monkeypatch.setenv("HTDEMUCS_WEIGHTS", "off")
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    from audiotabs_tpu.parallel.mesh import make_mesh
    from audiotabs_tpu.runtime.batch_runner import transcribe_batch

    mesh = make_mesh((8,), ("data",))
    results = transcribe_batch(song_files, tmp_path, mesh=mesh, host_workers=2)
    assert len(results) == 8
    for i, r in enumerate(results):
        assert r.job_id == f"song{i}"
        assert r.score is not None
        out = tmp_path / "jobs" / f"song{i}" / "out"
        assert (out / "result.json").exists()
        assert (out / "result.musicxml").exists()
    # distinct songs → distinct chord roots detected in at least some cases
    roots = {c.label.split(":")[0] for r in results for c in r.chords if c.label != "N"}
    assert len(roots) >= 3


def test_batch_vs_single_parity_wrap_padded(tmp_path, monkeypatch):
    """The batch path must forward true lengths so wrap-padded tails don't
    change the key/chords vs the single-song path (advisor round-2 medium:
    transcribe_batch used to drop the true_lens it computed)."""
    monkeypatch.setenv("TRANSCRIPTION_MODE", "notes")
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "2")
    monkeypatch.setenv("HTDEMUCS_WEIGHTS", "off")
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    from audiotabs_tpu.parallel.mesh import make_mesh
    from audiotabs_tpu.runtime.batch_runner import transcribe_batch
    from audiotabs_tpu.runtime.pipeline import run_pipeline

    # 3 s G-major arpeggio: padded to the 4 s bucket, so 1 s of wrap-padded
    # tail exists for the masks to ignore
    sr = 22050
    t = np.arange(3 * sr) / sr
    y = np.zeros(3 * sr, dtype=np.float32)
    rng = np.random.default_rng(7)
    for k, p in enumerate([55, 59, 62, 67, 62, 59] * 2):
        s0 = int(k * 0.25 * sr)
        seg = np.arange(int(0.25 * sr)) / sr
        f = 440.0 * 2 ** ((p - 69) / 12)
        y[s0 : s0 + len(seg)] += (0.35 * np.sin(2 * np.pi * f * seg)).astype(np.float32)
        y[s0 : s0 + 300] += 0.2 * rng.standard_normal(300).astype(np.float32)
    wav = tmp_path / "gmaj.wav"
    write_wav(wav, y, sr)

    mesh = make_mesh((8,), ("data",))
    (batch_result,) = transcribe_batch([wav], tmp_path / "batch", mesh=mesh)

    job_dir = tmp_path / "jobs" / "single"
    for sub in ("input", "work", "out"):
        (job_dir / sub).mkdir(parents=True)
    single_result = run_pipeline(job_dir, wav)

    assert batch_result.key_signature == single_result.key_signature
    assert [c.label for c in batch_result.chords] == [
        c.label for c in single_result.chords
    ]


@pytest.mark.slow
def test_batch_64_songs_config5_scale(tmp_path, monkeypatch):
    """BASELINE config 5 shape: 64 songs through ONE sharded program on the
    8-virtual-device mesh (short clips keep the CPU run tractable)."""
    monkeypatch.setenv("TRANSCRIPTION_MODE", "notes")
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "2")
    monkeypatch.setenv("HTDEMUCS_WEIGHTS", "off")
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    from audiotabs_tpu.parallel.mesh import make_mesh
    from audiotabs_tpu.runtime.batch_runner import batched_fused_analysis, transcribe_batch

    sr = 22050
    rng = np.random.default_rng(1)
    paths = []
    for i in range(64):
        root = 45 + (i % 12)
        t = np.arange(sr * 2) / sr
        y = sum(
            0.25 * np.sin(2 * np.pi * 440 * 2 ** ((p - 69) / 12) * t)
            for p in (root, root + 4, root + 7)
        )
        for k in range(0, len(y) - 300, sr // 2):
            y[k : k + 300] += 0.2 * rng.standard_normal(300)
        p = tmp_path / f"s{i:02d}.wav"
        write_wav(p, np.asarray(y, dtype=np.float32), sr)
        paths.append(p)

    mesh = make_mesh((8,), ("data",))
    # the sharded program: 64 rows over 8 devices = 8 songs per device
    batch = np.stack(
        [np.pad(np.zeros(0, np.float32), (0, 0))] * 0
        + [np.frombuffer(open(p, "rb").read()[44:], dtype="<i2").astype(np.float32) / 32768.0 for p in paths]
    )
    feats = batched_fused_analysis(batch, sr, mesh=mesh)
    assert feats["chord_emissions"].shape[0] == 64
    assert np.isfinite(np.asarray(feats["beat_activation"], dtype=np.float32)).all()

    # full end-to-end on a subset through the same runner (host tail incl.)
    results = transcribe_batch(paths[:16], tmp_path / "run", mesh=mesh, host_workers=4)
    assert len(results) == 16
    assert all(r.score is not None for r in results)


@pytest.mark.slow
def test_batch_with_separation(song_files, tmp_path, monkeypatch):
    """The sharded batch program runs REAL htdemucs separation per song
    (separate → analyze in one dispatch) when the checkpoint exists, and the
    per-song artifacts report the separated stem."""
    import json
    from pathlib import Path

    weights = Path(__file__).resolve().parent.parent / "audiotabs_tpu/weights/htdemucs.npz"
    if not weights.exists():
        pytest.skip("no trained htdemucs checkpoint")
    monkeypatch.setenv("TRANSCRIPTION_MODE", "notes")
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "2")
    from audiotabs_tpu.config import reload_settings

    reload_settings()
    from audiotabs_tpu.parallel.mesh import make_mesh
    from audiotabs_tpu.runtime.batch_runner import transcribe_batch

    mesh = make_mesh((8,), ("data",))
    results = transcribe_batch(song_files[:4], tmp_path, mesh=mesh, host_workers=2)
    assert len(results) == 4
    for i in range(4):
        bt = json.loads(
            (tmp_path / "jobs" / f"song{i}" / "out" / "beat_times.json").read_text()
        )
        assert bt["stem_source"] not in ("mix", "hpss_harmonic")


def test_batch_chunked_dispatch_matches_single_dispatch(monkeypatch):
    """BATCH_SONGS_PER_DEVICE bounds the per-dispatch program size (the
    remote TPU compile helper rejects programs with too many local songs
    inlined). Chunked dispatches must return exactly what one big dispatch
    returns."""
    monkeypatch.setenv("PAD_SECONDS_BUCKET", "2")
    monkeypatch.setenv("HTDEMUCS_WEIGHTS", "off")
    from audiotabs_tpu.config import reload_settings

    from audiotabs_tpu.parallel.mesh import make_mesh
    from audiotabs_tpu.runtime.batch_runner import batched_fused_analysis

    sr = 22050
    rng = np.random.default_rng(3)
    t = np.arange(sr * 2) / sr
    batch = np.stack(
        [
            (0.3 * np.sin(2 * np.pi * 220 * 2 ** (i / 12.0) * t)
             + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
            for i in range(6)
        ]
    )
    lens = np.array([len(t)] * 5 + [len(t) // 2], np.int32)
    mesh = make_mesh((2,), ("data",))

    monkeypatch.setenv("BATCH_SONGS_PER_DEVICE", "8")
    reload_settings()
    one = batched_fused_analysis(batch, sr, mesh=mesh, true_lens=lens)

    monkeypatch.setenv("BATCH_SONGS_PER_DEVICE", "1")
    reload_settings()
    chunked = batched_fused_analysis(batch, sr, mesh=mesh, true_lens=lens)
    monkeypatch.delenv("BATCH_SONGS_PER_DEVICE")
    reload_settings()

    assert set(one) == set(chunked)
    for k in one:
        a, b = np.asarray(one[k]), np.asarray(chunked[k])
        assert a.shape == b.shape, k
        assert np.allclose(a, b, atol=1e-5), k
