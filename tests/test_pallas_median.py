import numpy as np
import pytest

import jax.numpy as jnp

from audiotabs_tpu.ops.hpss import _median_filter_lastaxis
from audiotabs_tpu.ops.pallas_median import median_filter_lastaxis_pallas


def test_pallas_median_matches_xla(rng):
    x = rng.standard_normal((40, 300)).astype(np.float32)
    ref = np.asarray(_median_filter_lastaxis(jnp.asarray(x), 31))
    got = np.asarray(median_filter_lastaxis_pallas(jnp.asarray(x), 31, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pallas_median_small_window(rng):
    x = rng.standard_normal((10, 100)).astype(np.float32)
    ref = np.asarray(_median_filter_lastaxis(jnp.asarray(x), 5))
    got = np.asarray(median_filter_lastaxis_pallas(jnp.asarray(x), 5, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pallas_hpss_masks(rng):
    from audiotabs_tpu.ops.hpss import hpss_masks
    from audiotabs_tpu.ops.pallas_median import hpss_masks_pallas

    S = np.abs(rng.standard_normal((64, 200))).astype(np.float32)
    mh_ref, mp_ref = (np.asarray(m) for m in hpss_masks(jnp.asarray(S), 17, 17))
    mh, mp = (np.asarray(m) for m in hpss_masks_pallas(jnp.asarray(S), 17, 17))
    np.testing.assert_allclose(mh, mh_ref, atol=1e-5)
    np.testing.assert_allclose(mp, mp_ref, atol=1e-5)
