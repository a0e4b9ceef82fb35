import numpy as np

import jax


def test_mesh_construction():
    from audiotabs_tpu.parallel import make_mesh

    mesh = make_mesh((8,), ("data",))
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh((4, 2), ("data", "model"))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_batched_fused_analysis_8dev(monkeypatch):
    # mesh-mechanics test: pin the HPSS path (separation-in-batch has its
    # own slow-marked test in test_batch_runner.py)
    monkeypatch.setenv("HTDEMUCS_WEIGHTS", "off")
    from audiotabs_tpu.parallel import make_mesh
    from audiotabs_tpu.runtime.batch_runner import batched_fused_analysis

    mesh = make_mesh((8,), ("data",))
    sr = 22050
    t = np.arange(sr) / sr
    batch = np.stack(
        [0.3 * np.sin(2 * np.pi * 220 * 2 ** (i / 12.0) * t) for i in range(8)]
    ).astype(np.float32)
    out = batched_fused_analysis(batch, sr, mesh=mesh)
    em = np.asarray(out["chord_emissions"])
    assert em.shape[0] == 8
    assert np.isfinite(em).all()
    # each song's emissions should be a valid distribution per frame
    np.testing.assert_allclose(em.sum(axis=1), 1.0, atol=1e-3)


def test_model_axis_htdemucs_forward():
    """The "model" mesh axis is real, not a claim: the UNCHANGED htdemucs
    forward runs with its parameters tensor-sharded over a (4, 2)
    ("data", "model") mesh — GSPMD inserts the collectives — and matches
    the single-device output. Also asserts the weights are physically
    distributed (the memory win TP exists for)."""
    import jax.numpy as jnp

    from audiotabs_tpu.models import htdemucs as hd
    from audiotabs_tpu.parallel import make_mesh
    from audiotabs_tpu.parallel.model_axis import shard_params_model_axis, sharded_count

    mesh = make_mesh((4, 2), ("data", "model"))
    params = hd.init_params(jax.random.PRNGKey(0), channels=8, bottom=64, t_layers=2)
    mix = np.asarray(
        0.1 * np.random.default_rng(0).standard_normal((2, 4096)), np.float32
    )

    ref = np.asarray(hd.forward(params, jnp.asarray(mix)))

    sharded = shard_params_model_axis(params, mesh)
    n_dist = sharded_count(sharded)
    assert n_dist >= 20, f"only {n_dist} params actually sharded over 'model'"
    out = np.asarray(jax.jit(lambda p, m: hd.forward(p, m))(sharded, jnp.asarray(mix)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_data_model_2d_composition():
    """DP x TP compose on ONE mesh: a song batch sharded over "data" runs
    through the UNCHANGED htdemucs forward whose parameters are tensor-
    sharded over "model" — GSPMD partitions both axes in one program (the
    scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
    the collectives). Output must match the fully-replicated run."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiotabs_tpu.models import htdemucs as hd
    from audiotabs_tpu.parallel import make_mesh
    from audiotabs_tpu.parallel.model_axis import shard_params_model_axis, sharded_count

    mesh = make_mesh((4, 2), ("data", "model"))
    params = hd.init_params(jax.random.PRNGKey(0), channels=8, bottom=64, t_layers=2)
    batch = np.asarray(
        0.1 * np.random.default_rng(1).standard_normal((8, 2, 4096)), np.float32
    )

    ref = np.asarray(jax.vmap(lambda m: hd.forward(params, m))(jnp.asarray(batch)))

    sharded = shard_params_model_axis(params, mesh)
    assert sharded_count(sharded) >= 20
    batch_dev = jax.device_put(
        jnp.asarray(batch), NamedSharding(mesh, P("data", None, None))
    )
    out = np.asarray(
        jax.jit(jax.vmap(hd.forward, in_axes=(None, 0)))(sharded, batch_dev)
    )
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_graft_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = jax.device_get(out)
    assert isinstance(out, dict)
    assert np.isfinite(np.asarray(out["chord_emissions"])).all()
    assert np.isfinite(np.asarray(out["amt_frame"], dtype=np.float32)).all()

    ge.dryrun_multichip(8)
