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


# ---------------------------------------------------------------------------
# Epipolar gating through the camera API (GeometricCamera::epipolarConstrain
# / matchAndtriangulate). Two behaviors exist upstream:
#   - Pinhole (Pinhole.cpp:107-129): point-to-epipolar-line distance through
#     F12 = K1^-T [t12]x R12 K2^-1, gate 3.84 * unc.
#   - KannalaBrandt8 (KannalaBrandt8.cpp:216-221, 306-392): fisheye rays have
#     no linear epipolar line in pixel space, so the check IS a triangulation:
#     parallax gate (cos > 0.9998 rejects), DLT, cheirality in both views,
#     and 5.991-sigma reprojection chi2 in both images; epipolarConstrain is
#     TriangulateMatches(...) > 1e-4.
# Both are batched over match candidates (vmap axis N).
# ---------------------------------------------------------------------------


def epipolar_constrain_pinhole(
    params1: jax.Array, params2: jax.Array, kp1: jax.Array, kp2: jax.Array,
    R12: jax.Array, t12: jax.Array, unc: jax.Array,
) -> jax.Array:
    """Pinhole::epipolarConstrain, batched: kp1/kp2 (N,2), unc (N,) is the
    octave sigma2 of kp2. Returns (N,) bool."""
    fx1, fy1, cx1, cy1 = params1[0], params1[1], params1[2], params1[3]
    fx2, fy2, cx2, cy2 = params2[0], params2[1], params2[2], params2[3]
    K1 = jnp.array([[fx1, 0.0, cx1], [0.0, fy1, cy1], [0.0, 0.0, 1.0]])
    K2 = jnp.array([[fx2, 0.0, cx2], [0.0, fy2, cy2], [0.0, 0.0, 1.0]])
    tx = jnp.array([
        [0.0, -t12[2], t12[1]],
        [t12[2], 0.0, -t12[0]],
        [-t12[1], t12[0], 0.0],
    ])
    F12 = jnp.linalg.inv(K1).T @ tx @ R12 @ jnp.linalg.inv(K2)
    kp1h = jnp.concatenate([kp1, jnp.ones_like(kp1[:, :1])], axis=1)
    l2 = kp1h @ F12  # (N,3): epipolar line in image 2 (a,b,c)
    num = jnp.sum(l2[:, :2] * kp2, axis=1) + l2[:, 2]
    den = l2[:, 0] ** 2 + l2[:, 1] ** 2
    return (den > 0) & (num * num / jnp.maximum(den, 1e-30) < 3.84 * unc)


def triangulate_matches(
    unproject1, unproject2, project1, project2,
    params1: jax.Array, params2: jax.Array,
    kp1: jax.Array, kp2: jax.Array,
    R12: jax.Array, t12: jax.Array,
    sigma2_1: jax.Array, sigma2_2: jax.Array,
):
    """GeometricCamera::matchAndtriangulate / KB8::TriangulateMatches,
    batched: unproject/project are the model functions above (partial-apply
    agnostic), kp* (N,2), sigma2_* (N,). Returns (z1 (N,), p3D (N,3) in
    camera-1 frame); z1 <= 0 encodes rejection exactly as the reference's
    negative return codes (parallax, cheirality, chi2)."""
    r1 = jax.vmap(lambda uv: unproject1(params1, uv))(kp1)  # (N,3)
    r2 = jax.vmap(lambda uv: unproject2(params2, uv))(kp2)
    r21 = r2 @ R12.T
    cos_par = jnp.sum(r1 * r21, 1) / (
        jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r21, axis=1)
    )
    Tcw1 = jnp.eye(4)
    R21 = R12.T
    Tcw2 = jnp.eye(4).at[:3, :3].set(R21).at[:3, 3].set(-R21 @ t12)
    ray1 = r1 / r1[:, 2:3]
    ray2 = r2 / r2[:, 2:3]
    X, w = jax.vmap(lambda a, b: triangulate_dlt(a, b, Tcw1, Tcw2))(ray1, ray2)
    z1 = X[:, 2]
    X2 = X @ R21.T + (-R21 @ t12)
    uv1 = jax.vmap(lambda x: project1(params1, x))(X)
    uv2 = jax.vmap(lambda x: project2(params2, x))(X2)
    e1 = jnp.sum((uv1 - kp1) ** 2, 1)
    e2 = jnp.sum((uv2 - kp2) ** 2, 1)
    ok = (
        (cos_par <= 0.9998)
        & (z1 > 0)
        & (X2[:, 2] > 0)
        & (e1 <= 5.991 * sigma2_1)
        & (e2 <= 5.991 * sigma2_2)
        & (jnp.abs(w) > 1e-12)
    )
    return jnp.where(ok, z1, -1.0), X


def epipolar_constrain_kb8(
    params1: jax.Array, params2: jax.Array, kp1: jax.Array, kp2: jax.Array,
    R12: jax.Array, t12: jax.Array, sigma2_1: jax.Array, sigma2_2: jax.Array,
) -> jax.Array:
    """KannalaBrandt8::epipolarConstrain (triangulation > 1e-4), batched."""
    z1, _ = triangulate_matches(
        unproject_kb8, unproject_kb8, project_kb8, project_kb8,
        params1, params2, kp1, kp2, R12, t12, sigma2_1, sigma2_2,
    )
    return z1 > 1e-4


# ---------------------------------------------------------------------------
# Fisheye -> rectified-pinhole keypoint lift (pipeline entry for KB8 rigs).
#
# The reference keeps KannalaBrandt8 live in its Settings camera-type enum
# (Settings.h:46-50) and constructs KB8 frames without the radtan undistort
# pass (Frame.cc:697-707: mDistCoef empty => keypoints used raw, the camera
# model itself carries the distortion). This rebuild's solvers/matchers are
# uniformly pinhole-normalized, so a KB8 camera enters the pipeline by
# lifting each detected keypoint through the model's exact Newton inversion
# (unproject_kb8) onto the ideal-pinhole image plane of the SAME (fx,fy,
# cx,cy) — after which every downstream stage (frustum gates, reprojection
# factors, triangulation) sees a distortion-free camera. One small batched
# device dispatch per frame.
# ---------------------------------------------------------------------------

_rectify_kb8_jit = None

# Incidence-angle validity limit for the lift. Beyond 90 deg the pinhole
# plane cannot represent the ray at all (tan wraps to the wrong side and a
# >90-deg detection would silently become a finite wrong-side measurement);
# slightly below 90 the tan(theta) stretch and its noise amplification
# explode. 85 deg keeps tan bounded (~11.4) while covering everything a
# pinhole-normalized backend can meaningfully use. The reference never hits
# this case because it keeps KB8 keypoints in native fisheye pixels
# (Frame.cc constructs KB8 frames without undistortion and the optimizer
# projects through the KB8 model).
KB8_MAX_THETA_DEG = 85.0


def rectify_kb8_points(params: "jax.Array | object", pts: "object",
                       return_aux: bool = False,
                       max_theta_deg: float = KB8_MAX_THETA_DEG):
    """(N,2) raw fisheye pixels -> (N,2) rectified-pinhole pixels.

    params = [fx fy cx cy k1 k2 k3 k4]; the rectified plane reuses the same
    fx/fy/cx/cy, so callers keep rig.K[c] = params[:4].

    With ``return_aux=True`` also returns

      * ``valid`` (N,) bool — solved incidence angle < ``max_theta_deg``
        (see KB8_MAX_THETA_DEG: beyond it the lift is unrepresentable or
        numerically explosive) and the Newton solve finite,
      * ``sigma2_scale`` (N,) — measurement-variance inflation of the lift,
        the largest eigenvalue of J J^T for the 2x2 lift Jacobian
        J = d(rectified px)/d(raw px). Raw-pixel detection noise sigma^2
        becomes (at worst, along the major axis) sigma^2 * sigma2_scale on
        the rectified plane; consumers divide their inv_sigma2 weights by
        it so edge-of-FOV features are not over-trusted.

    Inputs are padded to a power-of-two bucket before the jitted kernel so
    varying per-frame keypoint counts reuse one executable per bucket."""
    import numpy as np

    from ..utils.shapes import bucket_pow2

    global _rectify_kb8_jit
    if _rectify_kb8_jit is None:

        @jax.jit
        def _fn(params, uv, max_theta):
            # NOTE: this deliberately does NOT reuse unproject_kb8. The
            # reference's unprojection clips theta_d to pi/2 before the
            # Newton solve (KannalaBrandt8.cpp:116-143 does the same) —
            # harmless upstream where keypoints stay in fisheye pixels, but
            # for the rectifying lift the clip SATURATES every detection
            # whose distorted angle exceeds pi/2 (theta >~ poly^-1(pi/2)):
            # the pixel coordinate freezes at the saturation radius and the
            # radial derivative collapses to zero, i.e. wrong measurement
            # AND wrong (over-confident) noise model in the band just below
            # 90 deg. Solving the unclipped equation keeps coordinate and
            # Jacobian exact up to the validity limit; beyond-90 detections
            # then solve to theta > pi/2 and are flagged invalid here.
            def solve_theta(theta_d):
                return lax.fori_loop(
                    0, 10,
                    lambda _, th: th - (_kb8_poly(params, th) - theta_d)
                    / _kb8_poly_deriv(params, th),
                    jnp.clip(theta_d, 0.0, jnp.pi / 2),  # clip the INIT only
                )

            def lift(p):
                pw = (p - params[2:4]) / params[:2]
                theta_d = jnp.sqrt(pw @ pw)
                th = solve_theta(theta_d)
                safe = theta_d > 1e-8
                scale = jnp.where(
                    safe, jnp.tan(th) / jnp.where(safe, theta_d, 1.0), 1.0)
                return pw * scale * params[:2] + params[2:4]

            out = jax.vmap(lift)(uv)
            pw = (uv - params[None, 2:4]) / params[None, :2]
            theta = jax.vmap(solve_theta)(jnp.sqrt(jnp.sum(pw * pw, axis=1)))
            valid = (theta < max_theta) & jnp.all(jnp.isfinite(out), axis=1)
            # exact 2x2 lift Jacobian via autodiff; worst-direction variance
            # inflation = lambda_max(J J^T)
            J = jax.vmap(jax.jacfwd(lift))(uv)
            JJt = jnp.einsum("nij,nkj->nik", J, J)
            tr = JJt[:, 0, 0] + JJt[:, 1, 1]
            det = JJt[:, 0, 0] * JJt[:, 1, 1] - JJt[:, 0, 1] * JJt[:, 1, 0]
            disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
            s2 = tr / 2 + disc
            s2 = jnp.where(jnp.isfinite(s2), jnp.maximum(s2, 1e-6), jnp.inf)
            return out, valid, s2

        _rectify_kb8_jit = _fn
    pts = np.asarray(pts)
    n = len(pts)
    nb = bucket_pow2(max(n, 1), minimum=64)
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pad = np.full((nb, 2), 1.0)
    pad[:n] = pts
    out, valid, s2 = _rectify_kb8_jit(
        jnp.asarray(params, dt), jnp.asarray(pad, dt),
        jnp.asarray(np.deg2rad(max_theta_deg), dt),
    )
    out = np.asarray(out[:n]).astype(pts.dtype, copy=False)
    if not return_aux:
        return out
    return out, np.asarray(valid[:n]), np.asarray(s2[:n], np.float64)


def kb8_ray_grid(params, width: int, height: int):
    """Per-pixel unit-depth ray directions (H,W,3) for a KB8 camera —
    the fisheye analogue of the pinhole (u-cx)/fx grid; used by renderers
    and by dense-geometry consumers."""
    import numpy as np

    u, v = np.meshgrid(np.arange(width, dtype=np.float64),
                       np.arange(height, dtype=np.float64))
    uv = jnp.asarray(np.stack([u.ravel(), v.ravel()], -1))
    p = jnp.asarray(np.asarray(params, np.float64))
    rays = jax.vmap(lambda q: unproject_kb8(p, q))(uv)
    return np.asarray(rays).reshape(height, width, 3)
