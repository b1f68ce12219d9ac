"""Interp-combo fast path: per-(pose-pair, timestamp) hoisting of the GP
interpolation chain (solver/ba.py build_interp_tables/_interp_packs).

The pose Jacobians of every GP edge factor as J1cam @ Q with Q a function of
(pair, t) only — these tests pin the factored path to the per-edge packed
path (reference chain: G2oTypes.cc:177-443) at f64 round-off level, on both
the factor and whole-problem levels, including shared-time and
adversarial distinct-time edge distributions and the sharded solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcslam_tpu.factors import reprojection
from amcslam_tpu.solver import ba
from amcslam_tpu.solver.lm import lm_optimize
from amcslam_tpu.utils.synthetic import make_local_ba_problem


def _strip(data):
    return data._replace(mg_it=None, mg_it_sid=None, mg_it_t=None,
                         sg_it=None, sg_it_sid=None, sg_it_t=None)


def _rand_se3(rng, scale=0.5):
    from amcslam_tpu.ops import lie

    return np.asarray(lie.exp_se3(jnp.asarray(rng.randn(6) * scale)))


def test_factor_interp_equals_packed():
    rng = np.random.RandomState(0)
    T1 = jnp.asarray(_rand_se3(rng))
    T2 = jnp.asarray(_rand_se3(rng))
    v1 = jnp.asarray(rng.randn(6) * 0.3)
    v2 = jnp.asarray(rng.randn(6) * 0.3)
    t1, t2, t = 0.0, 0.5, 0.2
    Tbc = jnp.asarray(_rand_se3(rng, 0.2))
    K = jnp.asarray([400.0, 410.0, 320.0, 240.0])
    bf = jnp.asarray(40.0)
    Xw = jnp.asarray([1.0, -0.5, 8.0])
    obs2 = jnp.asarray([300.0, 200.0])
    obs3 = jnp.asarray([300.0, 200.0, 280.0])

    pack = reprojection.gp_pair_pack(T1, v1, T2, v2)
    ip = reprojection.gp_interp_pack(pack, T1, v1, t1, t2, t)

    ref = reprojection.mono_gp_residual_jac_packed(
        pack, T1, v1, t1, t2, t, Tbc, K, Xw, obs2
    )
    fast = reprojection.mono_gp_residual_jac_interp(ip, Tbc, K, Xw, obs2)
    for a, b in zip(ref, fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)

    ref_s = reprojection.stereo_gp_residual_jac_packed(
        pack, T1, v1, t1, t2, t, Tbc, K, bf, Xw, obs3
    )
    fast_s = reprojection.stereo_gp_residual_jac_interp(ip, Tbc, K, bf, Xw, obs3)
    for a, b in zip(ref_s, fast_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("shared", [True, False])
def test_problem_interp_equals_fallback(shared):
    data, s0, _ = make_local_ba_problem(
        n_kf=8, n_fixed=1, n_lm=96, obs_per_lm=3, gpobs_per_lm=2,
        seed=3, shared_times=shared,
    )
    data_fb = _strip(data)
    lvl = (data.mg_valid, data.sg_valid, data.st_valid)
    p1 = ba.make_ba_problem(data, *lvl)
    p2 = ba.make_ba_problem(data_fb, *lvl)
    np.testing.assert_allclose(float(p1.chi2(s0)), float(p2.chi2(s0)),
                               rtol=1e-12)
    _, st1 = lm_optimize(p1, s0, 6)
    _, st2 = lm_optimize(p2, s0, 6)
    assert int(st1.iterations) == int(st2.iterations)
    np.testing.assert_allclose(float(st1.chi2), float(st2.chi2), rtol=1e-9)
    np.testing.assert_allclose(float(st1.lam), float(st2.lam), rtol=1e-6)


def test_shared_times_combo_compression():
    """Realistic camera-phase times: combos ~ pairs*cams*slots << edges."""
    data, _, _ = make_local_ba_problem(
        n_kf=10, n_fixed=1, n_lm=512, obs_per_lm=3, gpobs_per_lm=2, seed=0,
    )
    Em = int(np.sum(np.asarray(data.mg_valid)))
    n_used = len(np.unique(np.asarray(data.mg_it)[np.asarray(data.mg_valid)]))
    assert n_used < Em / 3, (n_used, Em)


def test_sharded_with_interp_tables():
    from jax.sharding import Mesh

    from amcslam_tpu.parallel.sharded_ba import (
        make_sharded_ba_problem,
        shard_ba_data,
    )

    n_dev = min(4, len(jax.devices()))
    data, s0, _ = make_local_ba_problem(
        n_kf=6, n_fixed=1, n_lm=64, obs_per_lm=3, gpobs_per_lm=1, seed=1,
    )
    assert data.mg_it is not None
    sb = shard_ba_data(data, s0, n_dev)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("l",))
    prob = make_sharded_ba_problem(mesh, sb)
    p_ref = ba.make_ba_problem(
        _strip(data), data.mg_valid, data.sg_valid, data.st_valid
    )
    c_sh = float(jax.jit(prob.chi2)(sb.state0))
    c_ref = float(jax.jit(p_ref.chi2)(s0))
    np.testing.assert_allclose(c_sh, c_ref, rtol=1e-10)
    _, st_sh = jax.jit(lambda s: lm_optimize(prob, s, 4))(sb.state0)
    _, st_ref = jax.jit(lambda s: lm_optimize(p_ref, s, 4))(s0)
    np.testing.assert_allclose(float(st_sh.chi2), float(st_ref.chi2),
                               rtol=1e-9)
