"""Lie-group kernel tests: round trips, Jacobian identities, finite differences.

Mirrors the reference's ad-hoc `jacobianNumercialDiff` checking
(Pose3utils.cc:82-109) as a proper unit-test suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcslam_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


def random_xi(key, scale=1.0, n=1):
    return jax.random.normal(key, (n, 6), dtype=jnp.float64) * scale


@pytest.mark.parametrize("scale", [1e-8, 1e-4, 0.5, 2.0])
def test_so3_exp_log_roundtrip(scale):
    w = np.array([0.3, -0.7, 0.55]) * scale
    R = lie.exp_so3(jnp.asarray(w))
    w2 = lie.log_so3(R)
    np.testing.assert_allclose(np.asarray(w2), w, rtol=1e-9, atol=1e-12)


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    for theta in [np.pi - 1e-3, np.pi - 1e-6]:
        w = axis * theta
        R = lie.exp_so3(jnp.asarray(w))
        w2 = np.asarray(lie.log_so3(R))
        np.testing.assert_allclose(w2, w, rtol=1e-6)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.8])
def test_se3_exp_log_roundtrip(scale):
    xi = np.asarray(random_xi(KEY, scale)[0])
    T = lie.exp_se3(jnp.asarray(xi))
    xi2 = np.asarray(lie.log_se3(T))
    np.testing.assert_allclose(xi2, xi, rtol=1e-8, atol=1e-14)


def test_se3_inv():
    xi = random_xi(KEY)[0]
    T = lie.exp_se3(xi)
    np.testing.assert_allclose(
        np.asarray(T @ lie.se3_inv(T)), np.eye(4), atol=1e-12
    )


def test_adjoint_identity():
    """T exp(xi) T^-1 == exp(Adj(T) xi)."""
    k1, k2 = jax.random.split(KEY)
    T = lie.exp_se3(random_xi(k1)[0])
    xi = random_xi(k2, 0.3)[0]
    lhs = T @ lie.exp_se3(xi) @ lie.se3_inv(T)
    rhs = lie.exp_se3(lie.adj_se3(T) @ xi)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_se3_ad_vs_adjoint_derivative():
    """Adj(exp(xi)) == expm(ad(xi))."""
    xi = random_xi(KEY, 0.4)[0]
    lhs = lie.adj_se3(lie.exp_se3(xi))
    rhs = jax.scipy.linalg.expm(lie.se3_ad(xi))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-8)


def test_circle_dot():
    """d(exp(xi) h)/d xi at xi=0 equals circle_dot(p) for homogeneous h=[p,1]."""
    p = jnp.asarray([0.2, -1.3, 2.5], dtype=jnp.float64)
    h = jnp.concatenate([p, jnp.ones(1, dtype=jnp.float64)])

    def f(xi):
        return lie.exp_se3(xi) @ h

    J = jax.jacfwd(f)(jnp.zeros(6, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(J), np.asarray(lie.circle_dot(p)), atol=1e-12)


@pytest.mark.parametrize("scale", [1e-7, 1e-3, 0.05, 0.7, 2.5])
def test_left_jacobian_so3_fd(scale):
    """Jl(w) delta == lim log(exp(w + h delta) exp(w)^-1)/h."""
    k1, k2 = jax.random.split(KEY)
    w = jnp.asarray(np.random.RandomState(3).randn(3) * scale)
    Jl = lie.left_jacobian_so3(w)

    def f(dw):
        return lie.log_so3(lie.exp_so3(w + dw) @ lie.exp_so3(w).T)

    J_fd = jax.jacfwd(f)(jnp.zeros(3, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(Jl), np.asarray(J_fd), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(Jl @ lie.left_jacobian_so3_inv(w)), np.eye(3), atol=1e-9
    )


@pytest.mark.parametrize("scale", [1e-7, 1e-3, 0.05, 0.7, 2.0])
def test_left_jacobian_pose3_fd(scale):
    """Full SE(3) left Jacobian (incl. Barfoot Q block) vs autodiff of the
    definition: Jl(xi) = d/d eps log(exp(xi + eps) * exp(xi)^-1)."""
    xi = jnp.asarray(np.random.RandomState(7).randn(6) * scale)
    Jl = lie.left_jacobian_pose3(xi)

    def f(dxi):
        return lie.log_se3(lie.exp_se3(xi + dxi) @ lie.se3_inv(lie.exp_se3(xi)))

    J_fd = jax.jacfwd(f)(jnp.zeros(6, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(Jl), np.asarray(J_fd), rtol=1e-5, atol=1e-9)


def test_pose3_jacobian_inverses_and_right():
    xi = jnp.asarray(np.random.RandomState(11).randn(6) * 0.6)
    Jl = lie.left_jacobian_pose3(xi)
    Jl_inv = lie.left_jacobian_pose3_inv(xi)
    np.testing.assert_allclose(np.asarray(Jl @ Jl_inv), np.eye(6), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(lie.right_jacobian_pose3(xi)),
        np.asarray(lie.left_jacobian_pose3(-xi)),
        atol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(lie.right_jacobian_pose3_inv(xi) @ lie.right_jacobian_pose3(xi)),
        np.eye(6),
        atol=1e-10,
    )


def test_vmap_and_f32():
    """Kernels are vmap-compatible and stable in float32."""
    xis = random_xi(KEY, 0.5, n=64)
    Ts = jax.vmap(lie.exp_se3)(xis)
    back = jax.vmap(lie.log_se3)(Ts)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xis), atol=1e-9)

    xis32 = xis.astype(jnp.float32)
    Ts32 = jax.vmap(lie.exp_se3)(xis32)
    assert Ts32.dtype == jnp.float32
    back32 = jax.vmap(lie.log_se3)(Ts32)
    np.testing.assert_allclose(np.asarray(back32), np.asarray(xis), atol=1e-5)
    # tiny angles in f32 must not produce NaN
    tiny = jax.vmap(lie.log_se3)(jax.vmap(lie.exp_se3)(xis32 * 1e-6))
    assert np.all(np.isfinite(np.asarray(tiny)))


def test_host_geom_matches_device():
    """ops/host_geom (pure NumPy, host-glue fast path) must match the jitted
    kernels: exp/log SE(3), Jr^-1, and GP pose interpolation."""
    import numpy as np

    from amcslam_tpu.ops import gp, host_geom

    rng = np.random.RandomState(0)
    for i in range(10):
        xi = rng.randn(6) * (2.0 if i % 2 else 0.01)
        T_np = host_geom.exp_se3(xi)
        T_jx = np.asarray(lie.exp_se3(jnp.asarray(xi, jnp.float64)))
        np.testing.assert_allclose(T_np, T_jx, atol=1e-12)
        np.testing.assert_allclose(
            host_geom.log_se3(T_np),
            np.asarray(lie.log_se3(jnp.asarray(T_np, jnp.float64))),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            host_geom.right_jacobian_pose3_inv(xi),
            np.asarray(lie.right_jacobian_pose3_inv(jnp.asarray(xi, jnp.float64))),
            atol=1e-9,
        )

    for _ in range(5):
        T1 = host_geom.exp_se3(rng.randn(6) * 0.5)
        v1 = rng.randn(6) * 0.5
        v2 = rng.randn(6) * 0.5
        t1, t2, t = 0.0, 0.4, 0.17
        T2 = T1 @ host_geom.exp_se3(v1 * (t2 - t1) * 0.9)
        eye = jnp.eye(6, dtype=jnp.float64)
        T_jx = np.asarray(
            gp.query_pose(
                jnp.asarray(T1, jnp.float64), jnp.asarray(T2, jnp.float64),
                jnp.asarray(v1, jnp.float64), jnp.asarray(v2, jnp.float64),
                t1, t2, t, eye, eye,
            )
        )
        T_np = host_geom.gp_interp_pose(T1, v1, t1, T2, v2, t2, t)
        np.testing.assert_allclose(T_np, T_jx, atol=1e-9)
