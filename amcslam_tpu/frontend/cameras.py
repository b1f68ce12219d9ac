"""Geometric camera models (rebuild of src/CameraModels/ + GeometricCamera.h).

Two models, as in the reference's Settings camera-type enum (Settings.h:46-50):

  * Pinhole         (Pinhole.cpp)        — params (fx, fy, cx, cy)
  * KannalaBrandt8  (KannalaBrandt8.cpp) — fisheye theta-polynomial,
    params (fx, fy, cx, cy, k0, k1, k2, k3); Newton unprojection.

Functional API (no classes): every function takes the parameter vector as its
first argument, works on single points, and vmaps cleanly. `CAMERA_PINHOLE` /
`CAMERA_KB8` tags let pipelines `lax.switch` per-camera when rigs mix models.
Analytic projection Jacobians mirror the reference formulas and are tested
against autodiff; `unproject_kb8`'s fixed 10-step Newton iteration matches
KannalaBrandt8::unproject (KannalaBrandt8.cpp:116-143) with lax.fori_loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

CAMERA_PINHOLE = 0
CAMERA_KB8 = 1


# ---------------------------------------------------------------------------
# Pinhole
# ---------------------------------------------------------------------------


def project_pinhole(params: jax.Array, Xc: jax.Array) -> jax.Array:
    invz = 1.0 / Xc[2]
    return jnp.stack(
        [params[0] * Xc[0] * invz + params[2], params[1] * Xc[1] * invz + params[3]]
    )


def project_jac_pinhole(params: jax.Array, Xc: jax.Array) -> jax.Array:
    invz = 1.0 / Xc[2]
    invz2 = invz * invz
    z = jnp.zeros_like(invz)
    return jnp.stack(
        [
            jnp.stack([params[0] * invz, z, -params[0] * Xc[0] * invz2]),
            jnp.stack([z, params[1] * invz, -params[1] * Xc[1] * invz2]),
        ]
    )


def unproject_pinhole(params: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixel -> unit-depth ray (Pinhole.cpp:61-68)."""
    return jnp.stack(
        [
            (uv[0] - params[2]) / params[0],
            (uv[1] - params[3]) / params[1],
            jnp.ones_like(uv[0]),
        ]
    )


def uncertainty2_pinhole(params: jax.Array, uv: jax.Array) -> jax.Array:
    return jnp.ones((), uv.dtype)


# ---------------------------------------------------------------------------
# Kannala-Brandt fisheye (8 params)
# ---------------------------------------------------------------------------


def _kb8_poly(params, theta):
    t2 = theta * theta
    t4 = t2 * t2
    t6 = t4 * t2
    t8 = t4 * t4
    return theta * (1 + params[4] * t2 + params[5] * t4 + params[6] * t6 + params[7] * t8)


def _kb8_poly_deriv(params, theta):
    t2 = theta * theta
    t4 = t2 * t2
    t6 = t4 * t2
    t8 = t4 * t4
    return 1 + 3 * params[4] * t2 + 5 * params[5] * t4 + 7 * params[6] * t6 + 9 * params[7] * t8


def project_kb8(params: jax.Array, Xc: jax.Array) -> jax.Array:
    """Fisheye projection (KannalaBrandt8.cpp:45-60): r(theta) polynomial."""
    r2 = Xc[0] * Xc[0] + Xc[1] * Xc[1]
    r = jnp.sqrt(jnp.maximum(r2, jnp.finfo(Xc.dtype).tiny))
    theta = jnp.arctan2(r, Xc[2])
    f = _kb8_poly(params, theta)
    inv_r = jnp.where(r2 > 1e-12, 1.0 / r, jnp.zeros_like(r))
    return jnp.stack(
        [
            params[0] * f * Xc[0] * inv_r + params[2],
            params[1] * f * Xc[1] * inv_r + params[3],
        ]
    )


def project_jac_kb8(params: jax.Array, Xc: jax.Array) -> jax.Array:
    """Analytic 2x3 fisheye Jacobian (KannalaBrandt8.cpp:145-175)."""
    x, y, z = Xc[0], Xc[1], Xc[2]
    x2, y2, z2 = x * x, y * y, z * z
    r2 = x2 + y2
    r = jnp.sqrt(r2)
    r3 = r2 * r
    theta = jnp.arctan2(r, z)
    f = _kb8_poly(params, theta)
    fd = _kb8_poly_deriv(params, theta)
    rz = r2 * (r2 + z2)
    J00 = params[0] * (fd * z * x2 / rz + f * y2 / r3)
    J10 = params[1] * (fd * z * y * x / rz - f * y * x / r3)
    J01 = params[0] * (fd * z * y * x / rz - f * y * x / r3)
    J11 = params[1] * (fd * z * y2 / rz + f * x2 / r3)
    J02 = -params[0] * fd * x / (r2 + z2)
    J12 = -params[1] * fd * y / (r2 + z2)
    return jnp.stack([jnp.stack([J00, J01, J02]), jnp.stack([J10, J11, J12])])


def unproject_kb8(params: jax.Array, uv: jax.Array, n_newton: int = 10) -> jax.Array:
    """Pixel -> unit-depth ray by Newton inversion of the theta polynomial
    (KannalaBrandt8.cpp:116-143)."""
    dtype = uv.dtype
    pw = jnp.stack([(uv[0] - params[2]) / params[0], (uv[1] - params[3]) / params[1]])
    theta_d = jnp.sqrt(pw[0] * pw[0] + pw[1] * pw[1])
    theta_d = jnp.clip(theta_d, -jnp.pi / 2, jnp.pi / 2)

    def body(_, theta):
        fix = (_kb8_poly(params, theta) - theta_d) / _kb8_poly_deriv(params, theta)
        return theta - fix

    theta = lax.fori_loop(0, n_newton, body, theta_d)
    safe = theta_d > 1e-8
    scale = jnp.where(
        safe, jnp.tan(theta) / jnp.where(safe, theta_d, 1.0), jnp.ones((), dtype)
    )
    return jnp.stack([pw[0] * scale, pw[1] * scale, jnp.ones((), dtype)])


def uncertainty2_kb8(params: jax.Array, uv: jax.Array) -> jax.Array:
    return jnp.ones((), uv.dtype)


# ---------------------------------------------------------------------------
# Triangulation (GeometricTools.cc Triangulate: DLT via SVD of 4x4)
# ---------------------------------------------------------------------------


def triangulate_dlt(ray1: jax.Array, ray2: jax.Array, Tcw1: jax.Array, Tcw2: jax.Array):
    """DLT triangulation of normalized rays under two world-to-camera poses.

    Builds the 4x4 linear system rows x_i * P_i[2] - P_i[0] etc. and takes
    the smallest singular vector (GeometricTools.cc:Triangulate). Returns the
    Euclidean point and the homogeneous scale (w<=0 => invalid/at infinity).
    """
    P1 = Tcw1[:3, :]
    P2 = Tcw2[:3, :]
    A = jnp.stack(
        [
            ray1[0] * P1[2] - P1[0],
            ray1[1] * P1[2] - P1[1],
            ray2[0] * P2[2] - P2[0],
            ray2[1] * P2[2] - P2[1],
        ]
    )
    _, _, Vt = jnp.linalg.svd(A)
    Xh = Vt[-1]
    w = Xh[3]
    X = Xh[:3] / jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
    return X, w
