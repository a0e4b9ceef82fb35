"""Pallas TPU kernel: sliding-window median filter for HPSS.

XLA's lowering of the gather+sort median (ops/hpss.py) materializes a
[F, T, win] window tensor in HBM — ~31× the spectrogram in memory traffic.
This kernel DMAs overlapping [TILE_F, TILE_T + HALO] input tiles from HBM
into VMEM, forms the `win` shifted views with pltpu.roll (arbitrary lane
offsets aren't lowerable, so every view is a roll + an aligned prefix
slice), and medians them with an odd-even transposition network of
min/max compare-exchanges (Mosaic has no sort primitive). HBM traffic
drops to ~2× the input.

The kernel medians the last axis; the frequency-direction median reuses it
on the transposed input. Non-TPU backends use interpreter mode (tests) or
the XLA fallback in ops/hpss.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_F = 128
TILE_T = 512
HALO = 128  # lane-aligned halo: supports win up to 129


def _median_kernel(win: int, x_hbm, o_ref, scratch, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    W = TILE_T + HALO
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * TILE_F, TILE_F), pl.ds(j * TILE_T, W)],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()
    block = scratch[:, :]
    # view k = block[:, k : k+TILE_T], built as a right-roll by (W - k) and an
    # aligned [:, :TILE_T] prefix slice
    vals = [pltpu.roll(block, W - k, 1)[:, :TILE_T] if k else block[:, :TILE_T] for k in range(win)]
    for rnd in range(win):
        for k in range(rnd % 2, win - 1, 2):
            a, b = vals[k], vals[k + 1]
            vals[k] = jnp.minimum(a, b)
            vals[k + 1] = jnp.maximum(a, b)
    o_ref[:, :] = vals[win // 2]


@partial(jax.jit, static_argnames=("win", "interpret"))
def median_filter_lastaxis_pallas(x, win: int = 31, interpret: bool = False):
    """Median filter along the last axis of [F, T] with edge replication.

    vmap-compatible: rows are independent, so the batching rule folds the
    batch axis into the row axis and calls the same kernel — this is what
    lets the batch runner keep the Pallas path (a plain pallas_call with
    ANY-space blocks does not batch)."""
    if win >= HALO:
        raise ValueError(f"win must be < {HALO}")
    if win % 2 == 0:
        raise ValueError("win must be odd (even-window median averages two values; use the XLA path)")

    @jax.custom_batching.custom_vmap
    def run(x2d):
        return _median_impl(x2d, win, interpret)

    @run.def_vmap
    def _batched(axis_size, in_batched, xb):  # noqa: ANN001 - jax API shape
        B, F, T = xb.shape
        out = run(xb.reshape(B * F, T))  # recursive: supports nested vmap
        return out.reshape(B, F, T), True

    return run(x)


def _median_impl(x, win: int, interpret: bool):
    F, T = x.shape
    half = win // 2
    Fp = ((F + TILE_F - 1) // TILE_F) * TILE_F
    Tp = ((T + TILE_T - 1) // TILE_T) * TILE_T
    # left halo `half`, right halo up to HALO past the last tile
    xp = jnp.pad(x, ((0, Fp - F), (half, (Tp - T) - half + HALO)), mode="edge")

    grid = (Fp // TILE_F, Tp // TILE_T)
    out = pl.pallas_call(
        partial(_median_kernel, win),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE_F, TILE_T), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp, Tp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_F, TILE_T + HALO), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return out[:F, :T]


def hpss_masks_pallas(S_mag, kernel_harm: int = 31, kernel_perc: int = 31, power: float = 2.0):
    """Drop-in replacement for ops.hpss.hpss_masks using the Pallas median."""
    interpret = jax.default_backend() != "tpu"
    harm = median_filter_lastaxis_pallas(S_mag, kernel_harm, interpret=interpret)
    perc = median_filter_lastaxis_pallas(S_mag.T, kernel_perc, interpret=interpret).T
    hp = harm**power
    pp = perc**power
    tot = hp + pp
    safe = tot > 1e-10
    mask_h = jnp.where(safe, hp / jnp.where(safe, tot, 1.0), 0.5)
    return mask_h, 1.0 - mask_h
