"""Viterbi decoders as jitted lax.scan programs.

Replaces the reference's per-state Python-loop Viterbi (reference:
backend/app/services/chords/viterbi.py:4-41, O(states²·frames) in Python)
with two jitted forms:

  * ``viterbi_constant_switch`` — the chord-template decoder: cost =
    −log p(emit) + constant switch penalty. With a constant penalty the
    transition minimum collapses to ``min(stay, global_min + penalty)``,
    making each step O(states) instead of O(states²).
  * ``viterbi_log_dense`` — full log-domain Viterbi with an arbitrary
    transition matrix (used by the CRF chord decoder and note HMMs), one
    max-plus "matmul" per frame on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def viterbi_constant_switch(emissions, switch_penalty):
    """Min-cost path through [S, T] emission probabilities.

    Returns (path [T] int32, confidence [T] = emission prob of chosen state),
    matching the reference's contract (viterbi.py:4-41).
    """
    emissions = jnp.asarray(emissions)
    S, T = emissions.shape
    logp = -jnp.log(jnp.clip(emissions, 1e-9, 1.0))

    def step(dp, logp_t):
        m = jnp.min(dp)
        argm = jnp.argmin(dp)
        switch_cost = m + switch_penalty
        stay = dp
        new_dp = jnp.minimum(stay, switch_cost) + logp_t
        # backpointer: stay on s unless switching from the global argmin wins
        bp = jnp.where(stay <= switch_cost, jnp.arange(S), argm)
        return new_dp, bp

    dp0 = logp[:, 0]
    dp, bps = jax.lax.scan(step, dp0, logp[:, 1:].T, unroll=8)

    last = jnp.argmin(dp)

    def back(s, bp):
        prev = bp[s]
        return prev, prev  # output at frame t is the state BEFORE transition t→t+1

    _, path_rev = jax.lax.scan(back, last, bps, reverse=True, unroll=8)
    path = jnp.concatenate([path_rev, last[None]])
    conf = emissions[path, jnp.arange(T)]
    return path.astype(jnp.int32), conf


@partial(jax.jit, static_argnames=())
def viterbi_log_dense(log_emissions, log_transition, log_initial=None):
    """Max-product Viterbi: [T, S] log-emissions, [S, S] log-transitions.

    transition[i, j] = log p(state j at t+1 | state i at t).
    Returns (path [T] int32, final log-prob scalar).
    """
    log_emissions = jnp.asarray(log_emissions)
    T, S = log_emissions.shape
    if log_initial is None:
        log_initial = jnp.full((S,), -jnp.log(S))

    def step(score, obs_t):
        cand = score[:, None] + log_transition  # [S_prev, S_next]
        best = jnp.max(cand, axis=0) + obs_t
        bp = jnp.argmax(cand, axis=0)
        return best, bp

    score0 = log_initial + log_emissions[0]
    score, bps = jax.lax.scan(step, score0, log_emissions[1:], unroll=8)
    last = jnp.argmax(score)

    def back(s, bp):
        prev = bp[s]
        return prev, prev

    _, path_rev = jax.lax.scan(back, last, bps, reverse=True, unroll=8)
    path = jnp.concatenate([path_rev, last[None]])
    return path.astype(jnp.int32), jnp.max(score)
