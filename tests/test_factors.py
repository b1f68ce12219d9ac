"""Analytic factor Jacobians vs `jax.jacfwd` of the residual-after-retraction.

Each factor's hand-derived Jacobian (transcribed from G2oTypes.cc) must match
autodiff of r(state ⊞ delta) at delta = 0. Where the reference itself uses a
first-order BCH approximation (the -1/2 ad(v2) velocity coupling of the GP
prior and GP-interp factors), we check against the reference's own formula
structure with a loose tolerance and against autodiff of the approximated
quantity where exact.
"""

import jax
import jax.numpy as jnp
import numpy as np

from amcslam_tpu.factors import gp_prior, priors, reprojection
from amcslam_tpu.ops import lie

F64 = jnp.float64


def setup(seed=0):
    rng = np.random.RandomState(seed)
    T1 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.3, F64))
    v1 = jnp.asarray(rng.randn(6) * 0.4, F64)
    v2 = jnp.asarray(rng.randn(6) * 0.4, F64)
    T2 = T1 @ lie.exp_se3(v1 * 0.1 + jnp.asarray(rng.randn(6) * 0.01, F64))
    Tbc = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.2, F64))
    K = jnp.asarray([420.0, 420.0, 480.0, 300.0], F64)
    Xw = jnp.asarray(rng.randn(3) * 2.0 + np.array([0.0, 0.0, 8.0]), F64)
    obs = jnp.asarray(rng.rand(2) * 100 + 400, F64)
    return T1, v1, T2, v2, Tbc, K, Xw, obs, rng


def retract_pose(T, v, d):
    return T @ lie.exp_se3(d[:6]), v + d[6:]


def test_mono_residual_jac():
    T1, v1, T2, v2, Tbc, K, Xw, obs, rng = setup(1)
    r, J_pose, J_point, Xc = reprojection.mono_residual_jac(T1, Tbc, K, Xw, obs)
    assert float(Xc[2]) > 0

    def f_pose(d):
        T, _ = retract_pose(T1, v1, d)
        return reprojection.mono_residual(T, Tbc, K, Xw, obs)[0]

    def f_point(dX):
        return reprojection.mono_residual(T1, Tbc, K, Xw + dX, obs)[0]

    J_fd = jax.jacfwd(f_pose)(jnp.zeros(12, F64))
    np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_fd), atol=1e-8)
    Jp_fd = jax.jacfwd(f_point)(jnp.zeros(3, F64))
    np.testing.assert_allclose(np.asarray(J_point), np.asarray(Jp_fd), atol=1e-8)


def test_stereo_residual_jac():
    T1, v1, T2, v2, Tbc, K, Xw, obs, rng = setup(2)
    bf = jnp.asarray(40.0, F64)
    obs3 = jnp.concatenate([obs, obs[:1] - 3.0])
    r, J_pose, J_point, Xc = reprojection.stereo_residual_jac(T1, Tbc, K, bf, Xw, obs3)

    def f_pose(d):
        T, _ = retract_pose(T1, v1, d)
        return reprojection.stereo_residual(T, Tbc, K, bf, Xw, obs3)[0]

    J_fd = jax.jacfwd(f_pose)(jnp.zeros(12, F64))
    np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_fd), atol=1e-8)

    def f_point(dX):
        return reprojection.stereo_residual(T1, Tbc, K, bf, Xw + dX, obs3)[0]

    Jp_fd = jax.jacfwd(f_point)(jnp.zeros(3, F64))
    np.testing.assert_allclose(np.asarray(J_point), np.asarray(Jp_fd), atol=1e-8)


def test_gp_prior_jac_pose_blocks():
    """Pose rows of the GP prior Jacobian are exact; velocity rows use the
    reference's first-order BCH term. Check pose rows vs autodiff exactly and
    velocity rows to first order."""
    T1, v1, T2, v2, Tbc, K, Xw, obs, rng = setup(3)
    t1, t2 = 0.0, 0.1
    r, J1, J2 = gp_prior.gp_prior_residual_jac(T1, v1, t1, T2, v2, t2)

    def f1(d):
        T, v = retract_pose(T1, v1, d)
        return gp_prior.gp_prior_residual(T, v, t1, T2, v2, t2)

    def f2(d):
        T, v = retract_pose(T2, v2, d)
        return gp_prior.gp_prior_residual(T1, v1, t1, T, v, t2)

    J1_fd = np.asarray(jax.jacfwd(f1)(jnp.zeros(12, F64)))
    J2_fd = np.asarray(jax.jacfwd(f2)(jnp.zeros(12, F64)))
    # residual value
    np.testing.assert_allclose(
        np.asarray(r),
        np.asarray(f1(jnp.zeros(12, F64))),
        atol=1e-12,
    )
    # pose-residual rows (top 6) and velocity columns are exact
    np.testing.assert_allclose(np.asarray(J1)[:6], J1_fd[:6], atol=1e-7)
    np.testing.assert_allclose(np.asarray(J2)[:6], J2_fd[:6], atol=1e-7)
    np.testing.assert_allclose(np.asarray(J1)[:, 6:], J1_fd[:, 6:], atol=1e-7)
    np.testing.assert_allclose(np.asarray(J2)[:, 6:], J2_fd[:, 6:], atol=1e-7)
    # velocity rows wrt pose: reference's first-order BCH approximation of
    # d(Jr^-1(xi) v2)/dxi — agree to O(|xi|) (xi ~ 0.04 here)
    np.testing.assert_allclose(np.asarray(J1)[6:, :6], J1_fd[6:, :6], atol=5e-2)
    np.testing.assert_allclose(np.asarray(J2)[6:, :6], J2_fd[6:, :6], atol=5e-2)


def test_mono_gp_residual_jac():
    T1, v1, T2, v2, Tbc, K, Xw, obs, rng = setup(4)
    t1, t2, t = 0.0, 0.1, 0.04
    r, J1, J2, J_point, J_ext, Xc = reprojection.mono_gp_residual_jac(
        T1, v1, t1, T2, v2, t2, t, Tbc, K, Xw, obs
    )
    assert float(Xc[2]) > 0

    def f1(d):
        T, v = retract_pose(T1, v1, d)
        return reprojection.mono_gp_residual(T, v, t1, T2, v2, t2, t, Tbc, K, Xw, obs)[0]

    def f2(d):
        T, v = retract_pose(T2, v2, d)
        return reprojection.mono_gp_residual(T1, v1, t1, T, v, t2, t, Tbc, K, Xw, obs)[0]

    def fpt(dX):
        return reprojection.mono_gp_residual(T1, v1, t1, T2, v2, t2, t, Tbc, K, Xw + dX, obs)[0]

    def fext(de):
        return reprojection.mono_gp_residual(
            T1, v1, t1, T2, v2, t2, t, Tbc @ lie.exp_se3(de), K, Xw, obs
        )[0]

    J1_fd = np.asarray(jax.jacfwd(f1)(jnp.zeros(12, F64)))
    J2_fd = np.asarray(jax.jacfwd(f2)(jnp.zeros(12, F64)))
    # The reference's chain rule uses the same BCH shortcut inside JinT*;
    # it is first-order exact — tolerances scaled to the local increments.
    np.testing.assert_allclose(np.asarray(J1), J1_fd, atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(J2), J2_fd, atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(J_point), np.asarray(jax.jacfwd(fpt)(jnp.zeros(3, F64))), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(J_ext), np.asarray(jax.jacfwd(fext)(jnp.zeros(6, F64))), atol=1e-7
    )


def test_stereo_gp_residual_jac_point_block():
    T1, v1, T2, v2, Tbc, K, Xw, obs, rng = setup(5)
    bf = jnp.asarray(40.0, F64)
    obs3 = jnp.concatenate([obs, obs[:1] - 2.0])
    t1, t2, t = 0.0, 0.1, 0.1  # stereo GP obs at endpoint time behaves like EdgeStereo
    r, J1, J2, J_point, Xc = reprojection.stereo_gp_residual_jac(
        T1, v1, t1, T2, v2, t2, t, Tbc, K, bf, Xw, obs3
    )
    assert np.isfinite(np.asarray(r)).all()
    assert J1.shape == (3, 12) and J2.shape == (3, 12) and J_point.shape == (3, 3)


def test_velocity_and_extrinsic_priors():
    T1, v1, T2, v2, Tbc, K, Xw, obs, rng = setup(6)
    np.testing.assert_allclose(float(priors.velocity_residual(v1)[0]), float(v1[2]))
    J = priors.velocity_jac(v1)
    assert float(J[0, 8]) == 1.0 and float(np.abs(np.asarray(J)).sum()) == 1.0

    R_prior = lie.exp_so3(jnp.asarray([0.1, -0.2, 0.3], F64))
    rr = priors.extrinsic_prior_residual(Tbc, R_prior)
    J = priors.extrinsic_prior_jac(Tbc, R_prior)

    def f(de):
        return priors.extrinsic_prior_residual(Tbc @ lie.exp_se3(de), R_prior)

    J_fd = np.asarray(jax.jacfwd(f)(jnp.zeros(6, F64)))
    np.testing.assert_allclose(np.asarray(J), J_fd, atol=1e-7)


def test_vel_reproj_jac():
    T1, v1, T2, v2, Tbc, K, Xw, obs, rng = setup(7)
    dt = jnp.asarray(0.05, F64)
    r, J = priors.vel_reproj_jac(v1, T1, dt, Tbc, K, Xw, obs)

    def f(dv):
        return priors.vel_reproj_residual(v1 + dv, T1, dt, Tbc, K, Xw, obs)

    J_fd = np.asarray(jax.jacfwd(f)(jnp.zeros(6, F64)))
    np.testing.assert_allclose(np.asarray(J), J_fd, atol=1e-6, rtol=1e-4)


def test_packed_gp_eval_matches_reference_path():
    """The packed per-pair fast path must reproduce mono/stereo GP factor
    evaluation exactly (same math, reassociated)."""
    T1, v1, T2, v2, Tbc, K, Xw, obs, rng = setup(8)
    t1, t2, t = 0.0, 0.1, 0.033
    pack = reprojection.gp_pair_pack(T1, v1, T2, v2)
    ref_out = reprojection.mono_gp_residual_jac(
        T1, v1, t1, T2, v2, t2, t, Tbc, K, Xw, obs
    )
    fast_out = reprojection.mono_gp_residual_jac_packed(
        pack, T1, v1, t1, t2, t, Tbc, K, Xw, obs
    )
    for a, b in zip(ref_out, fast_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)

    bf = jnp.asarray(40.0, F64)
    obs3 = jnp.concatenate([obs, obs[:1] - 2.0])
    ref_s = reprojection.stereo_gp_residual_jac(
        T1, v1, t1, T2, v2, t2, t, Tbc, K, bf, Xw, obs3
    )
    fast_s = reprojection.stereo_gp_residual_jac_packed(
        pack, T1, v1, t1, t2, t, Tbc, K, bf, Xw, obs3
    )
    for a, b in zip(ref_s, fast_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
