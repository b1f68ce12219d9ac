"""GP motion-prior tests: kernel inverse, interpolation boundary conditions,
constant-velocity consistency (GaussianProcess.cc behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from amcslam_tpu.ops import gp, lie

F64 = jnp.float64


def make_qc(seed=0):
    rng = np.random.RandomState(seed)
    d = jnp.asarray(rng.uniform(0.5, 2.0, 6), dtype=F64)
    Qc = jnp.diag(d)
    return Qc, jnp.diag(1.0 / d)


def test_qi_inverse_closed_form():
    Qc, Qc_inv = make_qc()
    for dt in [0.05, 0.5, 2.0]:
        prod = gp.qi(jnp.asarray(dt, F64), Qc) @ gp.qi_inv(jnp.asarray(dt, F64), Qc_inv)
        np.testing.assert_allclose(np.asarray(prod), np.eye(12), atol=1e-10)


def test_query_pose_boundary():
    """Interpolation at the endpoints returns the endpoint poses exactly."""
    Qc, Qc_inv = make_qc(1)
    rng = np.random.RandomState(2)
    T1 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.5, F64))
    T2 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.5, F64))
    v1 = jnp.asarray(rng.randn(6) * 0.2, F64)
    v2 = jnp.asarray(rng.randn(6) * 0.2, F64)
    t1, t2 = 10.0, 10.4
    Tq1 = gp.query_pose(T1, T2, v1, v2, t1, t2, t1 + 1e-9, Qc, Qc_inv)
    Tq2 = gp.query_pose(T1, T2, v1, v2, t1, t2, t2 - 1e-9, Qc, Qc_inv)
    np.testing.assert_allclose(np.asarray(Tq1), np.asarray(T1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(Tq2), np.asarray(T2), atol=1e-7)


def test_query_pose_constant_velocity():
    """A constant-twist trajectory is reproduced exactly by the GP mean."""
    Qc, Qc_inv = make_qc(3)
    rng = np.random.RandomState(4)
    v = jnp.asarray(rng.randn(6) * 0.3, F64)
    T1 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.4, F64))
    t1, t2 = 0.0, 1.0
    T2 = T1 @ lie.exp_se3(v * (t2 - t1))
    for tau in [0.2, 0.5, 0.9]:
        Tq = gp.query_pose(T1, T2, v, v, t1, t2, tau, Qc, Qc_inv)
        Texp = T1 @ lie.exp_se3(v * tau)
        np.testing.assert_allclose(np.asarray(Tq), np.asarray(Texp), atol=1e-9)


def test_query_pose_aux_consistency():
    Qc, Qc_inv = make_qc(5)
    rng = np.random.RandomState(6)
    T1 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.5, F64))
    v1 = jnp.asarray(rng.randn(6) * 0.3, F64)
    v2 = jnp.asarray(rng.randn(6) * 0.3, F64)
    T2 = T1 @ lie.exp_se3(v1 * 0.4 + jnp.asarray(rng.randn(6) * 0.02, F64))
    T, (At1, Pt1, dT, xi12) = gp.query_pose_aux(T1, T2, v1, v2, 0.0, 0.4, 0.17, Qc, Qc_inv)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T1 @ dT), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(xi12), np.asarray(lie.log_se3(lie.se3_inv(T1) @ T2)), atol=1e-12
    )
    assert At1.shape == (6, 12) and Pt1.shape == (6, 12)
    # Interpolated pose lies "between" the endpoints (sanity)
    assert np.isfinite(np.asarray(T)).all()


def test_query_pose_jit_vmap():
    """Interpolation is jittable and vmappable over query times (the per-camera
    async-timestamp axis: Frame.cc:391-417 re-interpolates each camera)."""
    Qc, Qc_inv = make_qc(7)
    rng = np.random.RandomState(8)
    T1 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.5, F64))
    v = jnp.asarray(rng.randn(6) * 0.3, F64)
    T2 = T1 @ lie.exp_se3(v * 0.5)
    taus = jnp.linspace(0.05, 0.45, 8).astype(F64)

    f = jax.jit(jax.vmap(lambda t: gp.query_pose(T1, T2, v, v, 0.0, 0.5, t, Qc, Qc_inv)))
    Ts = f(taus)
    assert Ts.shape == (8, 4, 4)
    assert np.isfinite(np.asarray(Ts)).all()


def test_interp_closed_form_matches_matrix_products():
    """The Hermite closed form of interp_matrices equals the reference's
    Qi(t-t1) Phi(t,t2)^T QiInv(t2-t1) product chain (f64, non-trivial Qc)."""
    Qc, Qc_inv = make_qc(9)
    t1, t2, t = 2.0, 2.7, 2.16
    Pt = gp.qi(jnp.asarray(t - t1, F64), Qc) @ gp.transition(
        jnp.asarray(t2 - t, F64), F64
    ).T @ gp.qi_inv(jnp.asarray(t2 - t1, F64), Qc_inv)
    At = gp.transition(jnp.asarray(t - t1, F64), F64) - Pt @ gp.transition(
        jnp.asarray(t2 - t1, F64), F64
    )
    At1, Pt1 = gp.interp_matrices(t1, t2, t, Qc, Qc_inv)
    np.testing.assert_allclose(np.asarray(At1), np.asarray(At[:6]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Pt1), np.asarray(Pt[:6]), atol=1e-10)
