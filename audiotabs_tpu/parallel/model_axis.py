"""Tensor (model-axis) parallelism as a sharding config, not a rewrite.

`mesh.py` promises that a 2-D ("data", "model") mesh turns model
parallelism on without code changes. This module makes that concrete for a
real production program — the htdemucs forward (models/htdemucs.py), the
largest model in the pipeline: every parameter is `device_put` with a
NamedSharding that partitions its largest `model`-divisible axis across
the "model" axis, and the unchanged `hd.forward` is jitted against those
shardings. XLA's GSPMD partitioner then propagates the layouts through the
convs/matmuls/attention and inserts the ICI collectives (all-gather /
reduce-scatter) itself — which is exactly the TPU-native answer to tensor
parallelism: annotate, don't rewrite (SURVEY.md §2c).

The weights are physically distributed (each device holds 1/model_size of
every sharded parameter — the memory win TP exists for), and the output
must match the unsharded forward to float tolerance
(tests/test_parallel.py::test_model_axis_htdemucs_forward).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def model_axis_spec(shape: tuple[int, ...], model_size: int, min_dim: int = 8) -> P:
    """PartitionSpec sharding the largest axis divisible by ``model_size``
    (and at least ``min_dim`` long) over "model"; replicated when none is.

    Biases and tiny tensors stay replicated — sharding a length-4 vector
    over 2 devices saves nothing and costs a collective."""
    if model_size <= 1:
        return P()
    order = sorted(range(len(shape)), key=lambda a: -shape[a])
    for ax in order:
        if shape[ax] >= min_dim and shape[ax] % model_size == 0:
            return P(*[("model" if a == ax else None) for a in range(len(shape))])
    return P()


def shard_params_model_axis(params, mesh: Mesh):
    """device_put every leaf of a parameter pytree with its model-axis
    sharding. Leaves whose shapes don't divide stay replicated."""
    model_size = mesh.shape.get("model", 1)

    def place(x):
        arr = np.asarray(x)
        spec = model_axis_spec(arr.shape, model_size)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def sharded_count(params) -> int:
    """How many leaves are actually distributed (>1 distinct device shard)."""
    n = 0
    for leaf in jax.tree.leaves(params):
        if isinstance(leaf, jax.Array) and not leaf.sharding.is_fully_replicated:
            n += 1
    return n
