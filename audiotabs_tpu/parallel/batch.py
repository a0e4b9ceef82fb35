"""Sharded batch analysis: many songs through one jitted program.

The data-parallel runtime for BASELINE config 5 (64 songs over v5e-8):
a batch of equal-length (bucketed/padded) mono waveforms [B, T] is sharded
over the mesh "data" axis with shard_map; each shard runs the fused
analysis front end (CQT → chroma → chord emissions, beat activation) —
all the per-song tensor compute of the pipeline — with no cross-song
communication (a psum only aggregates the batch norm statistics needed by
nothing today; collectives become load-bearing when model axes appear).
Sequential decoders (DBN/Viterbi) run vmapped per song on the same mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..chords.templates import build_chord_library, emission_probs
from ..models.beat_rnn import onset_activation
from ..ops.chroma import chroma_from_cqt
from ..ops.cqt import cqt
from ..ops.features import rms


def _analyze_one(y, sr: int, chroma_fps: float, beat_fps: int, templates):
    """Per-song fused analysis. y: [T] → dict of features."""
    hop = int(round(sr / chroma_fps))
    C = cqt(y, sr, hop=hop, n_bins=72, bins_per_octave=12)
    chroma = chroma_from_cqt(C, bins_per_octave=12, norm=False)
    chroma_n = chroma / (jnp.linalg.norm(chroma, axis=0, keepdims=True) + 1e-9)
    energy = rms(y, 2048, hop)
    n = chroma_n.shape[-1]
    energy = energy[:n] / (jnp.max(energy[:n]) + 1e-9)
    labels, T = templates
    em = emission_probs(chroma_n, energy, labels, T)
    beat_act = onset_activation(y, sr, beat_fps)
    return {"chroma": chroma_n, "emissions": em, "beat_activation": beat_act}


def make_batch_step(sr: int, mesh: Mesh, chroma_fps: float = 10.0, beat_fps: int = 100, vocab: str = "majmin7"):
    """Build the jitted sharded batch step: [B, T] → feature dict, B sharded
    over the mesh "data" axis."""
    templates = build_chord_library(vocab)

    def _shard_fn(y_shard):  # [b_local, T]
        return jax.vmap(lambda y: _analyze_one(y, sr, chroma_fps, beat_fps, templates))(y_shard)

    from jax import shard_map

    sharded = shard_map(
        _shard_fn,
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(sharded)


def batch_analyze_sharded(batch, sr: int, mesh: Mesh | None = None, **kw):
    """Analyze a [B, T] batch of songs sharded across the mesh."""
    from .mesh import default_mesh

    mesh = mesh or default_mesh()
    step = make_batch_step(sr, mesh, **kw)
    batch = jnp.asarray(batch)
    sharding = NamedSharding(mesh, P("data", None))
    batch = jax.device_put(batch, sharding)
    return step(batch)
