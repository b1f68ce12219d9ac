"""Multi-chip (virtual 8-device CPU mesh) landmark-sharded BA parity tests:
the sharded SPMD path must reproduce the single-chip result exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from amcslam_tpu.parallel.sharded_ba import make_sharded_ba_problem, shard_ba_data
from amcslam_tpu.solver.ba import make_ba_problem
from amcslam_tpu.solver.lm import lm_optimize
from amcslam_tpu.utils.synthetic import make_local_ba_problem


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("l",))


@pytest.fixture(scope="module")
def mesh_e():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("e",))


def test_sharded_matches_single_chip(mesh):
    data, state0, gt = make_local_ba_problem(
        n_kf=4, n_fixed=1, n_lm=32, obs_per_lm=2, seed=7
    )
    single = make_ba_problem(data, data.mg_valid, data.sg_valid, data.st_valid)
    sb = shard_ba_data(data, state0, 8)
    sharded = make_sharded_ba_problem(mesh, sb)

    # chi2 parity (all closures jitted — eager shard_map is pathologically
    # slow on the virtual CPU mesh)
    c1 = float(jax.jit(single.chi2)(state0))
    c2 = float(jax.jit(sharded.chi2)(sb.state0))
    np.testing.assert_allclose(c2, c1, rtol=1e-12)

    # linearization parity on pose system
    lin1 = jax.jit(single.linearize)(state0)
    lin2 = jax.jit(sharded.linearize)(sb.state0)
    np.testing.assert_allclose(np.asarray(lin2[0]), np.asarray(lin1[0]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(lin2[1]), np.asarray(lin1[1]), atol=1e-8)

    # solve parity (pose increment identical; landmark increment via perm)
    lam = jnp.asarray(0.5, jnp.float64)
    (dxp1, dxl1), xx1, xb1 = jax.jit(single.solve)(lin1, lam)
    (dxp2, dxl2), xx2, xb2 = jax.jit(sharded.solve)(lin2, lam)
    np.testing.assert_allclose(np.asarray(dxp2), np.asarray(dxp1), atol=1e-9)
    np.testing.assert_allclose(float(xx2), float(xx1), rtol=1e-9)
    np.testing.assert_allclose(float(xb2), float(xb1), rtol=1e-9)
    dxl2_np = np.asarray(dxl2)
    valid = sb.lm_perm >= 0
    np.testing.assert_allclose(
        dxl2_np[valid], np.asarray(dxl1)[sb.lm_perm[valid]], atol=1e-9
    )

    # full jitted LM runs under the mesh and matches the single-chip chi2
    s1, st1 = jax.jit(lambda s: lm_optimize(single, s, 3, lambda_init=1.0))(state0)
    run = jax.jit(lambda s: lm_optimize(sharded, s, 3, lambda_init=1.0))
    s2, st2 = run(sb.state0)
    np.testing.assert_allclose(float(st2.chi2), float(st1.chi2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s1.T), atol=1e-9)


def test_sharded_global_ba_matches_single_chip(mesh):
    """The same landmark-axis sharding serves the full/global BA (config 5b:
    gp_huber Huber chain over the whole temporal sequence) — a loop-closure
    GBA scales over chips exactly like the local window does."""
    data, state0, gt = make_local_ba_problem(
        n_kf=6, n_fixed=1, n_lm=48, obs_per_lm=3, seed=11
    )
    data = data._replace(gp_huber=jnp.asarray(True))
    single = make_ba_problem(
        data, data.mg_valid, data.sg_valid, data.st_valid, huber_on=True
    )
    sb = shard_ba_data(data, state0, 8)
    sharded = make_sharded_ba_problem(mesh, sb, huber_on=True)

    c1 = float(jax.jit(single.chi2)(state0))
    c2 = float(jax.jit(sharded.chi2)(sb.state0))
    np.testing.assert_allclose(c2, c1, rtol=1e-12)

    s1, st1 = jax.jit(lambda s: lm_optimize(single, s, 4, lambda_init=1e-5))(state0)
    s2, st2 = jax.jit(lambda s: lm_optimize(sharded, s, 4, lambda_init=1e-5))(sb.state0)
    np.testing.assert_allclose(float(st2.chi2), float(st1.chi2), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s1.T), atol=1e-8)


@pytest.mark.slow
def test_sharded_serving_shape_full_schedule(mesh):
    """VERDICT r3 item 5: sharded parity at the HEADLINE shape. The
    correctness logic is shape-independent but padding/permutation bugs are
    not — run the landmark-sharded path at 50 KF / 5k pts (the bench
    headline configuration) through a FULL 10-iteration LM schedule on the
    8-device mesh and require chi2 rtol <= 1e-10 + pose/landmark parity
    against the single-device problem."""
    data, state0, _ = make_local_ba_problem(
        n_kf=50, n_fixed=1, n_lm=5000, n_cams=6, obs_per_lm=4,
        gpobs_per_lm=2, noise_px=0.5, seed=0,
    )
    single = make_ba_problem(data, data.mg_valid, data.sg_valid, data.st_valid)
    sb = shard_ba_data(data, state0, 8)
    sharded = make_sharded_ba_problem(mesh, sb)

    s1, st1 = jax.jit(lambda s: lm_optimize(single, s, 10, lambda_init=1.0))(state0)
    s2, st2 = jax.jit(lambda s: lm_optimize(sharded, s, 10, lambda_init=1.0))(sb.state0)
    assert int(st1.iterations) == int(st2.iterations)
    np.testing.assert_allclose(float(st2.chi2), float(st1.chi2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(s2.T), np.asarray(s1.T), atol=1e-8)
    np.testing.assert_allclose(np.asarray(s2.v), np.asarray(s1.v), atol=1e-8)
    valid = sb.lm_perm >= 0
    np.testing.assert_allclose(
        np.asarray(s2.X)[valid], np.asarray(s1.X)[sb.lm_perm[valid]],
        atol=1e-7,
    )


def test_sharded_essential_graph_matches_single_device(mesh_e):
    """Edge-sharded PCG essential graph (parallel/sharded_eg.py) reproduces
    the single-device matrix-free PCG path: chi2, linearized D/b, one damped
    solve, and a full jitted 5-iteration LM run."""
    from amcslam_tpu.parallel.sharded_eg import (
        make_sharded_eg_problem,
        shard_eg_data,
    )
    from amcslam_tpu.solver.sim3_opt import make_essential_graph_problem_pcg
    from amcslam_tpu.utils.synthetic import make_essential_graph

    data, state0, _ = make_essential_graph(n_kf=48, n_loop=6, seed=3)
    single = make_essential_graph_problem_pcg(data)
    se = shard_eg_data(data, 8)
    sharded = make_sharded_eg_problem(mesh_e, se)

    c1 = float(jax.jit(single.chi2)(state0))
    c2 = float(jax.jit(sharded.chi2)(state0))
    np.testing.assert_allclose(c2, c1, rtol=1e-12)

    lin1 = jax.jit(single.linearize)(state0)
    lin2 = jax.jit(sharded.linearize)(state0)
    # D and b (replicated outputs) must agree
    np.testing.assert_allclose(np.asarray(lin2[4]), np.asarray(lin1[4]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(lin2[5]), np.asarray(lin1[5]),
                               atol=1e-9)

    lam = jnp.asarray(1e-6, jnp.float64)
    dx1, xx1, xb1 = jax.jit(single.solve)(lin1, lam)
    dx2, xx2, xb2 = jax.jit(sharded.solve)(lin2, lam)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx1), atol=1e-7)
    np.testing.assert_allclose(float(xx2), float(xx1), rtol=1e-7)
    np.testing.assert_allclose(float(xb2), float(xb1), rtol=1e-7)

    run1 = jax.jit(lambda s: lm_optimize(single, s, 5, lambda_init=1e-16))
    run2 = jax.jit(lambda s: lm_optimize(sharded, s, 5, lambda_init=1e-16))
    s1, st1 = run1(state0)
    s2, st2 = run2(state0)
    np.testing.assert_allclose(float(st2.chi2), float(st1.chi2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s2.t), np.asarray(s1.t), atol=1e-7)
