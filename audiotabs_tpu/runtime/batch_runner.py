"""Batch transcription: many songs through one sharded device program.

BASELINE config 5 (64 full-length mixes over a v5e-8): songs are padded to
the bucket length, stacked into a [B, T] batch, sharded over the mesh
"data" axis, and run through ONE vmapped fused-analysis program
(runtime/fused.py) under shard_map. Host-side decoding (DBN backtrack is
already inside the jitted program's outputs; note decoding, chords
segmentation, quantization, export) then runs per song in a thread pool —
the host work overlaps the device work of the next batch.
"""

from __future__ import annotations

import logging
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import config
from ..parallel.mesh import default_mesh
from ..schemas import JobResult

_LOG = logging.getLogger(__name__)

ANALYSIS_SR = 22050


def _load_and_bucket(paths: list[Path], bucket_s: float) -> tuple[np.ndarray, list[int], int]:
    """Load all songs, resample to the analysis rate, pad to ONE common
    bucket multiple → ([B, T] batch, true lengths, sr)."""
    from ..io import load_wav, peak_normalize, resample_poly_host

    signals = []
    for p in paths:
        y, sr = load_wav(p)
        y = peak_normalize(y)
        if sr != ANALYSIS_SR:
            y = resample_poly_host(y, sr, ANALYSIS_SR)
        signals.append(y)
    true_lens = [len(y) for y in signals]
    bucket = int(bucket_s * ANALYSIS_SR)
    T = ((max(true_lens) + bucket - 1) // bucket) * bucket
    batch = np.zeros((len(signals), T), dtype=np.float32)
    for i, y in enumerate(signals):
        batch[i, : len(y)] = y
        # wrap-pad the tail with the song itself
        rem = T - len(y)
        if rem > 0 and len(y) > 0:
            reps = int(np.ceil(rem / len(y)))
            batch[i, len(y) :] = np.tile(y, reps)[:rem]
    return batch, true_lens, ANALYSIS_SR


_BATCH_FN_CACHE: dict = {}


def _batched_fn(
    mesh,
    sr: int,
    separate: bool,
    switch_penalty: float,
    chord_backend: str,
    sep_cfg: tuple | None = None,
):
    """Cached jitted shard_map program. Rebuilding the closure per call
    would miss jax's jit cache and recompile through the relay every batch
    (~7 s/batch — the round-1 batch-throughput regression).

    ``sep_cfg`` = (seg, stride, shifts, n_sources, stem_idx, drums_idx)
    activates real htdemucs separation INSIDE the sharded program: each
    song runs separate → analyze on its own device, stems never leave the
    chip, and the whole config-5 batch is still ONE dispatch."""
    key = (mesh, sr, separate, switch_penalty, chord_backend, sep_cfg)
    fn = _BATCH_FN_CACHE.get(key)
    if fn is None:
        from jax import shard_map

        from .fused import fused_analysis

        def song(sep_params, y, tl):
            kwargs = dict(
                # None = auto (Pallas on TPU): the median kernel's custom
                # batching rule makes the Pallas path vmap-able, so batched
                # songs keep the fast HPSS
                use_pallas=None,
                switch_penalty=switch_penalty,
                separate=separate,
                chord_backend=chord_backend,
                true_len=tl,
            )
            if sep_cfg is not None:
                from ..models.htdemucs import _separate_program

                seg, stride, shifts, n_sources, stem_idx, drums_idx = sep_cfg
                stems = _separate_program(
                    sep_params, y, sr=sr, seg=seg, stride=stride,
                    shifts=shifts, n_sources=n_sources,
                )
                kwargs["separate"] = False
                return fused_analysis(
                    stems[stem_idx], sr, y_beat=stems[drums_idx], y_mix=y, **kwargs
                )
            return fused_analysis(y, sr, **kwargs)

        fn = jax.jit(
            shard_map(
                jax.vmap(song, in_axes=(None, 0, 0)),
                mesh=mesh,
                in_specs=(P(), P("data", None), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )
        )
        _BATCH_FN_CACHE[key] = fn
    return fn


def _resolve_separation(s, sr: int):
    """→ (sep_cfg for _batched_fn, DEVICE params pytree, chosen stem name |
    None). Delegates the checkpoint-derived constants to
    htdemucs.program_config — the same single source of truth the
    single-song path uses — and reuses its process-wide device upload."""
    placeholder = np.zeros((), np.float32)  # pytree leaf when no weights
    if not (s.ENABLE_DEMUCS and sr in (44100, 22050)):
        return None, placeholder, None
    from ..models import htdemucs as hd

    params = hd.load_params()
    if params is None:
        return None, placeholder, None
    cfg = hd.program_config(params, s.DEMUCS_MODEL, s.stem_priority())
    sep_cfg = (
        cfg["seg"], cfg["stride"], int(s.DEMUCS_SHIFTS),
        cfg["n_sources"], cfg["stem_idx"], cfg["drums_idx"],
    )
    return sep_cfg, hd.device_params(params), cfg["names"][cfg["stem_idx"]]


def batched_fused_analysis_stream(batch: np.ndarray, sr: int, mesh=None, true_lens=None):
    """Yield (start_row, host feature dict) per device dispatch.

    Batches larger than n_dev × BATCH_SONGS_PER_DEVICE are split into
    multiple dispatches of ONE compiled shape: the per-device program
    inlines every local song's separation+analysis, and past ~8 local songs
    it exceeds what the remote TPU compile helper accepts — chunking bounds
    program size. ALL dispatches are enqueued before the first blocking
    device_get (dispatches are async), so the device pipeline stays full
    while the caller consumes earlier chunks — host post-processing of
    chunk i overlaps device compute of chunk i+1. Pad rows (dispatch-shape
    alignment) are cropped from the yielded chunks.
    """
    mesh = mesh or default_mesh()
    n_dev = mesh.shape["data"]
    B = batch.shape[0]
    if true_lens is None:
        true_lens = np.full((B,), batch.shape[1], dtype=np.int32)
    true_lens = np.asarray(true_lens, dtype=np.int32)

    s = config.settings
    chunk = n_dev * max(1, int(s.BATCH_SONGS_PER_DEVICE))
    # Sharding only needs a multiple of n_dev; the tail dispatch runs at its
    # own (smaller) compiled shape rather than zero-padding up to the full
    # chunk (B=33 on 8 devices used to pad to 64 and burn ~2x device wall
    # on zero rows for one extra cached executable).
    pad_rows = (-B) % n_dev
    if pad_rows:
        _LOG.info("batch: padding %d zero rows to align B=%d to %d devices", pad_rows, B, n_dev)
        batch = np.concatenate([batch, np.zeros((pad_rows,) + batch.shape[1:], batch.dtype)])
        true_lens = np.concatenate([true_lens, np.full((pad_rows,), batch.shape[1], np.int32)])

    # real htdemucs separation when the checkpoint exists (same priority
    # logic as the single-song pipeline); else the weight-free HPSS fallback
    backend = s.CHORD_DETECTION_BACKEND
    sep_cfg, sep_params, stem_name = _resolve_separation(s, sr)
    fn = _batched_fn(
        mesh, sr, s.ENABLE_DEMUCS, s.SWITCH_PENALTY,
        backend if backend in ("deep", "template") else "both",
        sep_cfg,
    )
    outs = []
    for a in range(0, batch.shape[0], chunk):
        rows = min(chunk, batch.shape[0] - a)
        device_batch = jax.device_put(
            jnp.asarray(batch[a : a + rows]), NamedSharding(mesh, P("data", None))
        )
        device_lens = jax.device_put(
            jnp.asarray(true_lens[a : a + rows]), NamedSharding(mesh, P("data"))
        )
        outs.append((a, rows, fn(sep_params, device_batch, device_lens)))
    for a, rows, o in outs:
        host = jax.device_get(o)
        n = min(rows, B - a)
        yield a, {k: v[:n] for k, v in host.items()}


def batched_fused_analysis(batch: np.ndarray, sr: int, mesh=None, true_lens=None):
    """[B, T] → fused feature dict with a leading B axis, sharded over "data".

    ``true_lens`` [B] (samples) masks each song's chord decode past its true
    end (defaults to the full row). See batched_fused_analysis_stream for
    the dispatch-chunking contract; this wrapper concatenates the chunks.
    """
    parts = [h for _a, h in batched_fused_analysis_stream(batch, sr, mesh, true_lens)]
    if len(parts) == 1:
        return parts[0]
    return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}


def _postprocess_one(
    feats_i: dict, true_len: int, sr: int, job_dir: Path, job_id: str,
    stem_source: str | None = None,
) -> JobResult:
    """Host-side post-processing for one song given its fused features."""
    from .pipeline import run_pipeline_from_features

    return run_pipeline_from_features(
        feats_i, true_len, sr, job_dir, job_id, stem_source=stem_source
    )


def transcribe_batch(
    paths: list[Path | str],
    out_root: Path | str,
    *,
    mesh=None,
    host_workers: int = 4,
) -> list[JobResult]:
    """Transcribe a batch of songs; writes the usual artifact layout under
    out_root/jobs/<stem>/ and returns the JobResults."""
    paths = [Path(p) for p in paths]
    out_root = Path(out_root)
    t0 = time.perf_counter()
    batch, true_lens, sr = _load_and_bucket(paths, config.settings.PAD_SECONDS_BUCKET)
    t_load = time.perf_counter() - t0

    _cfg, _params, batch_stem_source = _resolve_separation(config.settings, sr)

    # unique job ids even when different directories share a filename
    stems = [p.stem for p in paths]
    job_ids = [
        stem if stems.count(stem) == 1 else f"{stem}-{i}" for i, stem in enumerate(stems)
    ]

    def one(i: int, feats_i: dict) -> JobResult:
        job_id = job_ids[i]
        job_dir = out_root / "jobs" / job_id
        for sub in ("input", "work", "out"):
            (job_dir / sub).mkdir(parents=True, exist_ok=True)
        return _postprocess_one(
            feats_i, true_lens[i], sr, job_dir, job_id, stem_source=batch_stem_source
        )

    # stream: submit each dispatch chunk's songs to the host pool as soon as
    # its transfer lands, so host post-processing of chunk i overlaps device
    # compute + transfer of chunk i+1 (wall ≈ max(device, host), not sum)
    t0 = time.perf_counter()
    futures = []
    with ThreadPoolExecutor(max_workers=host_workers) as pool:
        for a, feats_chunk in batched_fused_analysis_stream(
            batch, sr, mesh, true_lens=true_lens
        ):
            n = next(iter(feats_chunk.values())).shape[0]
            for j in range(min(n, len(paths) - a)):
                feats_i = {k: np.asarray(v[j]) for k, v in feats_chunk.items()}
                futures.append(pool.submit(one, a + j, feats_i))
        results = [f.result() for f in futures]
    t_run = time.perf_counter() - t0

    total_audio = sum(true_lens) / sr
    wall = t_load + t_run
    _LOG.info(
        "batch: %d songs, %.0fs audio in %.2fs (load %.2f device+host overlapped %.2f) = %.1f audio-s/s",
        len(paths), total_audio, wall, t_load, t_run, total_audio / wall,
    )
    return results
