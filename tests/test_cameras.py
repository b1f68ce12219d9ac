"""Camera model tests: projection Jacobians vs autodiff, Newton unprojection
roundtrip, DLT triangulation."""

import jax
import jax.numpy as jnp
import numpy as np

from amcslam_tpu.frontend import cameras
from amcslam_tpu.ops import lie

F64 = jnp.float64
KB8 = jnp.asarray([285.0, 286.0, 420.0, 400.0, -0.006, 0.04, -0.04, 0.008], F64)
PIN = jnp.asarray([420.0, 421.0, 480.0, 300.0], F64)


def test_pinhole_roundtrip_and_jac():
    rng = np.random.RandomState(0)
    for _ in range(5):
        Xc = jnp.asarray([rng.uniform(-2, 2), rng.uniform(-1, 1), rng.uniform(2, 20)], F64)
        uv = cameras.project_pinhole(PIN, Xc)
        ray = cameras.unproject_pinhole(PIN, uv)
        np.testing.assert_allclose(np.asarray(ray), np.asarray(Xc / Xc[2]), atol=1e-12)
        J = cameras.project_jac_pinhole(PIN, Xc)
        J_fd = jax.jacfwd(lambda X: cameras.project_pinhole(PIN, X))(Xc)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_fd), atol=1e-9)


def test_kb8_project_unproject_roundtrip():
    rng = np.random.RandomState(1)
    # wide angles (fisheye): up to ~70 degrees off-axis
    for _ in range(10):
        Xc = jnp.asarray(
            [rng.uniform(-3, 3), rng.uniform(-3, 3), rng.uniform(1.5, 10)], F64
        )
        uv = cameras.project_kb8(KB8, Xc)
        ray = cameras.unproject_kb8(KB8, uv)
        np.testing.assert_allclose(
            np.asarray(ray), np.asarray(Xc / Xc[2]), atol=1e-6
        )


def test_kb8_jacobian_matches_autodiff():
    rng = np.random.RandomState(2)
    for _ in range(5):
        Xc = jnp.asarray([rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 8)], F64)
        J = cameras.project_jac_kb8(KB8, Xc)
        J_fd = jax.jacfwd(lambda X: cameras.project_kb8(KB8, X))(Xc)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_fd), rtol=1e-6, atol=1e-8)


def test_triangulate_dlt():
    rng = np.random.RandomState(3)
    X = jnp.asarray([1.0, -0.5, 6.0], F64)
    T1 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.1, F64))
    T2 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.1 + np.array([1, 0, 0, 0, 0, 0]), F64))
    Tcw1, Tcw2 = lie.se3_inv(T1), lie.se3_inv(T2)
    r1 = lie.transform_point(Tcw1, X)
    r2 = lie.transform_point(Tcw2, X)
    Xt, w = cameras.triangulate_dlt(r1 / r1[2], r2 / r2[2], Tcw1, Tcw2)
    np.testing.assert_allclose(np.asarray(Xt), np.asarray(X), atol=1e-8)
