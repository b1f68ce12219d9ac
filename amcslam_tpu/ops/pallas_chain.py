"""Fused GP-interpolation-chain Pallas TPU kernel.

The WNOA interpolation chain (gp_pair_pack + gp_interp_pack in
factors/reprojection.py — the TPU-native redesign of GaussianProcess.cc:5-44
and G2oTypes.cc:177-223) is a ~200-op sequence of tiny (3,3)/(6,6) Lie-algebra
operations per (pose-pair, camera-timestamp) combo.  Left to XLA it lowers to
hundreds of microsecond-scale kernel launches whose dispatch latency — not
compute — costs ~1 ms per solver iteration (measured on v5e: the chain costs
1.2 ms even with ZERO downstream edges).  This module fuses the entire chain
into ONE Pallas kernel.

Design (lane-batched SoA):
  * combos live on the TPU lane dimension (padded to 128-lane tiles); every
    scalar field of every matrix is a (1, B) vector row;
  * 3x3 matrices are 9-row lists, matmuls are unrolled VPU FMAs — no MXU,
    no reductions, so Mosaic compiles the whole chain into straight-line
    vector code;
  * every 6x6 in this chain (SE(3) Jacobians, adjoints, ad-operators) is
    block-upper-triangular [[P, Q], [0, R]]; they are carried as (P, Q, R)
    triples of 3x3s, so 6x6 products cost 3 small matmuls instead of 8.

Numerics mirror ops/lie.py exactly (same series thresholds, same branchless
quaternion extraction, same Barfoot Q coefficients); the only algebraic
difference is computing adj(exp(-xi)) directly instead of
adj(inv(exp(xi))) — identical to roundoff.  Parity with the pure-JAX path is
tested to 1e-5 (f32) in tests/test_pallas_chain.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANES = 128


# ---------------------------------------------------------------------------
# In-kernel math on (1, B) lane vectors
# ---------------------------------------------------------------------------


def _mm(a, b):
    """3x3 @ 3x3, both as row-major 9-lists of (1, B) vectors."""
    return [
        sum(a[3 * i + k] * b[3 * k + j] for k in range(3))
        for i in range(3)
        for j in range(3)
    ]


def _mv(a, x):
    """3x3 @ 3-vector."""
    return [sum(a[3 * i + k] * x[k] for k in range(3)) for i in range(3)]


def _mT(a):
    return [a[3 * j + i] for i in range(3) for j in range(3)]


def _madd(*ms):
    return [sum(rows) for rows in zip(*ms)]


def _mscale(c, m):
    return [c * e for e in m]


def _hat(v):
    z = jnp.zeros_like(v[0])
    x, y, w = v[0], v[1], v[2]
    return [z, -w, y, w, z, -x, -y, x, z]


def _eye3(like):
    o = jnp.ones_like(like)
    z = jnp.zeros_like(like)
    return [o, z, z, z, o, z, z, z, o]


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


# block-upper-triangular 6x6: (P, Q, R) == [[P, Q], [0, R]]
def _ut_mm(t1, t2):
    P1, Q1, R1 = t1
    P2, Q2, R2 = t2
    return (_mm(P1, P2), _madd(_mm(P1, Q2), _mm(Q1, R2)), _mm(R1, R2))


def _ut_mv(t, v6):
    P, Q, R = t
    a, b = v6
    return (_madd(_mv(P, a), _mv(Q, b)), _mv(R, b))


def _ut_add(t1, t2):
    return (_madd(t1[0], t2[0]), _madd(t1[1], t2[1]), _madd(t1[2], t2[2]))


def _ut_scale(c, t):
    return (_mscale(c, t[0]), _mscale(c, t[1]), _mscale(c, t[2]))


def _small_threshold2(dtype) -> float:
    if jnp.dtype(dtype) == jnp.float64:
        return 1e-4
    return 4e-2


def _trig_coeffs(theta2):
    """(A, B, C) exactly as ops/lie.py:_trig_coeffs."""
    small = theta2 < _small_threshold2(theta2.dtype)
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe2)
    s, c = jnp.sin(theta), jnp.cos(theta)
    t4 = theta2 * theta2
    A = jnp.where(small, 1.0 - theta2 / 6.0 + t4 / 120.0, s / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0 + t4 / 720.0, (1.0 - c) / safe2)
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0 + t4 / 5040.0, (theta - s) / (safe2 * theta)
    )
    return A, B, C


def _exp_so3(w):
    A, B, _ = _trig_coeffs(_dot3(w, w))
    W = _hat(w)
    return _madd(_eye3(w[0]), _mscale(A, W), _mscale(B, _mm(W, W)))


def _jl_so3(w):
    _, B, C = _trig_coeffs(_dot3(w, w))
    W = _hat(w)
    return _madd(_eye3(w[0]), _mscale(B, W), _mscale(C, _mm(W, W)))


def _jl_so3_inv(w):
    theta2 = _dot3(w, w)
    small = theta2 < _small_threshold2(theta2.dtype)
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe2)
    s, c = jnp.sin(theta), jnp.cos(theta)
    t4 = theta2 * theta2
    D = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0 + t4 / 30240.0,
        1.0 / safe2 - (1.0 + c) / (2.0 * theta * s),
    )
    W = _hat(w)
    return _madd(_eye3(w[0]), _mscale(-0.5, W), _mscale(D, _mm(W, W)))


def _atan2_pos(y, x):
    """atan2(y, x) for y, x >= 0 (first quadrant) — Mosaic has no inverse
    trig, so this is a double-reduced odd Taylor series of atan.

    Reduction 1: z = min/max <= 1 (complement by pi/2 when y > x).
    Reduction 2: z > tan(pi/8) -> atan(z) = pi/4 + atan((z-1)/(z+1)),
    leaving |zr| <= tan(pi/8) ~= 0.4142 where the odd Taylor series of atan
    converges geometrically (ratio z^2 <= 0.1716): 9 terms give < 4e-8
    (covers f32), 20 terms < 1e-16 (covers f64 interpret-mode parity).
    """
    dt = y.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    swap = y > x
    z = jnp.minimum(y, x) / jnp.maximum(jnp.maximum(y, x), tiny)
    use_red = z > 0.41421356237309503
    zr = jnp.where(use_red, (z - 1.0) / (z + 1.0), z)
    z2 = zr * zr
    n_terms = 20 if jnp.dtype(dt) == jnp.float64 else 9
    p = jnp.zeros_like(z2)
    for k in range(n_terms - 1, 0, -1):  # Horner over odd-series coefficients
        sign = -1.0 if k % 2 else 1.0
        p = (p + sign / (2.0 * k + 1.0)) * z2
    a = zr * (1.0 + p)
    a = jnp.where(use_red, jnp.asarray(np.pi / 4.0, dt) + a, a)
    return jnp.where(swap, jnp.asarray(np.pi / 2.0, dt) - a, a)


def _log_so3(R):
    """Branchless quaternion extraction + series log, as ops/lie.py."""
    dt = R[0].dtype
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = R
    tr = m00 + m11 + m22
    p0 = 1.0 + tr
    p1 = 1.0 + 2.0 * m00 - tr
    p2 = 1.0 + 2.0 * m11 - tr
    p3 = 1.0 + 2.0 * m22 - tr
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    s0 = jnp.sqrt(jnp.maximum(p0, tiny))
    s1 = jnp.sqrt(jnp.maximum(p1, tiny))
    s2 = jnp.sqrt(jnp.maximum(p2, tiny))
    s3 = jnp.sqrt(jnp.maximum(p3, tiny))
    q0 = [p0 / (2 * s0), (m21 - m12) / (2 * s0), (m02 - m20) / (2 * s0),
          (m10 - m01) / (2 * s0)]
    q1 = [(m21 - m12) / (2 * s1), p1 / (2 * s1), (m01 + m10) / (2 * s1),
          (m02 + m20) / (2 * s1)]
    q2 = [(m02 - m20) / (2 * s2), (m01 + m10) / (2 * s2), p2 / (2 * s2),
          (m12 + m21) / (2 * s2)]
    q3 = [(m10 - m01) / (2 * s3), (m02 + m20) / (2 * s3), (m12 + m21) / (2 * s3),
          p3 / (2 * s3)]

    def pick(c, a, b):
        return [jnp.where(c, x, y) for x, y in zip(a, b)]

    # tournament argmax (ties resolve to the lower index, like jnp.argmax)
    c01 = p0 >= p1
    q01 = pick(c01, q0, q1)
    piv01 = jnp.maximum(p0, p1)
    c23 = p2 >= p3
    q23 = pick(c23, q2, q3)
    piv23 = jnp.maximum(p2, p3)
    q = pick(piv01 >= piv23, q01, q23)
    norm = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    q = [e / norm for e in q]
    flip = q[0] < 0
    q = [jnp.where(flip, -e, e) for e in q]
    w, v = q[0], q[1:]
    nv2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    small = nv2 < _small_threshold2(dt) * 0.25
    nv = jnp.sqrt(jnp.where(small, jnp.ones_like(nv2), nv2))
    w_safe = jnp.maximum(w, jnp.asarray(1e-3, dt))
    factor = jnp.where(
        small,
        2.0 / w_safe * (1.0 - nv2 / (3.0 * w_safe * w_safe)),
        2.0 * _atan2_pos(nv, w) / nv,  # w >= 0 after canonicalization
    )
    return [factor * e for e in v]


def _Q_coeffs(theta2):
    small = theta2 < _small_threshold2(theta2.dtype)
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe2)
    s, c = jnp.sin(theta), jnp.cos(theta)
    t3 = safe2 * theta
    t4 = safe2 * safe2
    t5 = t4 * theta
    th4 = theta2 * theta2
    cQ2 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0 + th4 / 5040.0,
                    (theta - s) / t3)
    cQ3 = jnp.where(small, -1.0 / 24.0 + theta2 / 720.0 - th4 / 40320.0,
                    (1.0 - 0.5 * safe2 - c) / t4)
    cQ4 = jnp.where(small, -1.0 / 60.0 + theta2 / 1260.0 - th4 / 60480.0,
                    cQ3 - 3.0 * (theta - s - t3 / 6.0) / t5)
    return cQ2, cQ3, cQ4


def _pose3_Q(rho, w):
    """Barfoot coupling block, as ops/lie.py:left_jacobian_pose3_Q."""
    X = _hat(w)
    Y = _hat(rho)
    XY = _mm(X, Y)
    YX = _mm(Y, X)
    XYX = _mm(X, YX)
    cQ2, cQ3, cQ4 = _Q_coeffs(_dot3(w, w))
    return _madd(
        _mscale(0.5, Y),
        _mscale(cQ2, _madd(XY, YX, XYX)),
        _mscale(-cQ3, _madd(_mm(X, XY), _mm(YX, X), _mscale(-3.0, XYX))),
        _mscale(-0.5 * cQ4, _madd(_mm(XYX, X), _mm(X, XYX))),
    )


def _jl_pose3(rho, w):
    """[[Jl(w), Q(rho,w)], [0, Jl(w)]] as a UT triple."""
    J = _jl_so3(w)
    return (J, _pose3_Q(rho, w), J)


def _jl_pose3_inv(rho, w):
    Ji = _jl_so3_inv(w)
    Q = _pose3_Q(rho, w)
    return (Ji, _mscale(-1.0, _mm(_mm(Ji, Q), Ji)), Ji)


def _exp_se3(rho, w):
    """-> (R, t)."""
    return _exp_so3(w), _mv(_jl_so3(w), rho)


def _neg(v):
    return [-e for e in v]


# ---------------------------------------------------------------------------
# The fused chain kernel
# ---------------------------------------------------------------------------


def _chain_kernel(T1_ref, v1_ref, T2_ref, v2_ref, ts_ref,
                  twb_ref, tbw_ref, q_ref):
    def row(ref, i):
        return ref[i:i + 1, :]

    R1 = [row(T1_ref, i) for i in range(9)]
    t1v = [row(T1_ref, 9 + i) for i in range(3)]
    R2 = [row(T2_ref, i) for i in range(9)]
    t2v = [row(T2_ref, 9 + i) for i in range(3)]
    v1 = ([row(v1_ref, i) for i in range(3)], [row(v1_ref, 3 + i) for i in range(3)])
    v2 = ([row(v2_ref, i) for i in range(3)], [row(v2_ref, 3 + i) for i in range(3)])
    tt1, tt2, tt = row(ts_ref, 0), row(ts_ref, 1), row(ts_ref, 2)

    # ---- gp_pair_pack (factors/reprojection.py:254) ----
    # T12 = T1^-1 T2
    R1T = _mT(R1)
    R12 = _mm(R1T, R2)
    t12 = _mv(R1T, [a - b for a, b in zip(t2v, t1v)])
    # xi12 = log_se3(T12) = [rho12, w12]
    w12 = _log_so3(R12)
    rho12 = _mv(_jl_so3_inv(w12), t12)
    # Jr^-1(xi12) = Jl^-1(-xi12)
    Jri = _jl_pose3_inv(_neg(rho12), _neg(w12))
    nu2 = _ut_mv(Jri, v2)
    adv2 = (_hat(v2[1]), _hat(v2[0]), _hat(v2[1]))
    # adj(exp(-xi12))
    Re, te = _exp_se3(_neg(rho12), _neg(w12))
    adjE = (Re, _mm(_hat(te), Re), Re)
    A1 = _ut_scale(-1.0, _ut_mm(Jri, adjE))
    B1 = _ut_scale(-0.5, _ut_mm(adv2, A1))
    B2 = _ut_scale(-0.5, _ut_mm(adv2, Jri))

    # ---- gp_interp_pack (factors/reprojection.py:348) ----
    dt = tt2 - tt1
    s = (tt - tt1) / dt
    s2 = s * s
    a12 = dt * s * (1.0 - s) * (1.0 - s)
    p11 = s2 * (3.0 - 2.0 * s)
    p12 = dt * s2 * (s - 1.0)
    xi12 = (rho12, w12)
    dxi = tuple(
        [a12 * a + p11 * b + p12 * c for a, b, c in zip(v1[h], xi12[h], nu2[h])]
        for h in range(2)
    )
    Rd, td = _exp_se3(dxi[0], dxi[1])
    Rw = _mm(R1, Rd)
    tw = [a + b for a, b in zip(_mv(R1, td), t1v)]
    RwT = _mT(Rw)
    tb = _neg(_mv(RwT, tw))
    # Ad_dT = adj(exp(-dxi));  Jr(dxi) = Jl(-dxi)
    Rei, tei = _exp_se3(_neg(dxi[0]), _neg(dxi[1]))
    Ad_dT = (Rei, _mm(_hat(tei), Rei), Rei)
    Jr_dxi = _jl_pose3(_neg(dxi[0]), _neg(dxi[1]))
    Q1 = _ut_add(
        _ut_mm(Jr_dxi, _ut_add(_ut_scale(p11, A1), _ut_scale(p12, B1))), Ad_dT
    )
    Q2 = _ut_scale(a12, Jr_dxi)
    Q3 = _ut_mm(Jr_dxi, _ut_add(_ut_scale(p11, Jri), _ut_scale(p12, B2)))
    Q4 = _ut_scale(p12, _ut_mm(Jr_dxi, Jri))

    # ---- outputs ----
    for i in range(9):
        twb_ref[i:i + 1, :] = Rw[i]
        tbw_ref[i:i + 1, :] = RwT[i]
    for i in range(3):
        twb_ref[9 + i:10 + i, :] = tw[i]
        tbw_ref[9 + i:10 + i, :] = tb[i]
    zero = jnp.zeros_like(tt)
    for b_i, (P, Q, R) in enumerate((Q1, Q2, Q3, Q4)):
        c0 = 6 * b_i
        for r in range(3):
            for c in range(3):
                q_ref[24 * r + c0 + c:24 * r + c0 + c + 1, :] = P[3 * r + c]
                q_ref[24 * r + c0 + 3 + c:24 * r + c0 + 4 + c, :] = Q[3 * r + c]
                q_ref[24 * (3 + r) + c0 + c:24 * (3 + r) + c0 + c + 1, :] = zero
                q_ref[24 * (3 + r) + c0 + 3 + c:24 * (3 + r) + c0 + 4 + c, :] = R[3 * r + c]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _packs_impl(T1, v1, T2, v2, t1, t2, t, interpret=False):
    dtype = T1.dtype
    S = T1.shape[0]
    Sp = max(_LANES, int(np.ceil(S / _LANES)) * _LANES)

    def padrows(x, width):
        return jnp.concatenate(
            [x, jnp.zeros((width, Sp - S), dtype)], axis=1
        ) if Sp > S else x

    # [R | t] rows, combos on lanes.  Padding uses identity poses with
    # t2 - t1 = 1 so every chain stays finite.
    T1r = padrows(jnp.concatenate(
        [T1[:, :3, :3].reshape(S, 9), T1[:, :3, 3]], axis=1).T, 12)
    T2r = padrows(jnp.concatenate(
        [T2[:, :3, :3].reshape(S, 9), T2[:, :3, 3]], axis=1).T, 12)
    if Sp > S:
        eye = jnp.tile(
            jnp.eye(3, dtype=dtype).reshape(9, 1), (1, Sp - S))
        padT = jnp.concatenate([eye, jnp.zeros((3, Sp - S), dtype)], axis=0)
        T1r = T1r.at[:, S:].set(padT)
        T2r = T2r.at[:, S:].set(padT)
    v1r = padrows(v1.T, 6)
    v2r = padrows(v2.T, 6)
    ts = jnp.stack([t1, t2, t])
    ts = jnp.concatenate(
        [ts, jnp.tile(jnp.asarray([[0.0], [1.0], [0.5]], dtype), (1, Sp - S))],
        axis=1) if Sp > S else ts

    grid = Sp // _LANES
    spec = lambda w: pl.BlockSpec((w, _LANES), lambda i: (0, i))  # noqa: E731
    twb, tbw, q = pl.pallas_call(
        _chain_kernel,
        grid=(grid,),
        in_specs=[spec(12), spec(6), spec(12), spec(6), spec(3)],
        out_specs=[spec(12), spec(12), spec(144)],
        out_shape=[
            jax.ShapeDtypeStruct((12, Sp), dtype),
            jax.ShapeDtypeStruct((12, Sp), dtype),
            jax.ShapeDtypeStruct((144, Sp), dtype),
        ],
        interpret=interpret,
    )(T1r, v1r, T2r, v2r, ts)

    def to44(m):
        R = m[:9, :S].T.reshape(S, 3, 3)
        tcol = m[9:12, :S].T
        top = jnp.concatenate([R, tcol[:, :, None]], axis=2)
        bot = jnp.tile(
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype)[None], (S, 1, 1))
        return jnp.concatenate([top, bot], axis=1)

    return {
        "Twb": to44(twb),
        "Tbw": to44(tbw),
        "Q": q[:, :S].T.reshape(S, 6, 24),
    }


def available() -> bool:
    """True when the fused kernel should be used (opt-in, TPU backend).

    Measured on v5e (50 KF / 5k pt local GP-BA, jitted LM loop): the fused
    kernel makes the full iteration 5.54 ms vs 4.85 ms for the XLA op chain
    — inside a large compiled program XLA pipelines the chain's small kernels
    well enough that Mosaic's single-launch straight-line code (1-sublane VPU
    ops + layout conversions at the block edges) is a net loss.  In eager
    dispatch the kernel wins (3.41 s vs 3.57 s per eager LM iter) and parity
    holds at ~8e-7, so it stays available for dispatch-bound callers via
    AMCSLAM_PALLAS_CHAIN=1.
    """
    import os

    if not os.environ.get("AMCSLAM_PALLAS_CHAIN"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def gp_interp_packs(T1, v1, T2, v2, t1, t2, t, interpret=False):
    """Fused per-combo interp packs {"Twb", "Tbw", "Q"}.

    Equivalent to vmap(gp_pair_pack) + vmap(gp_interp_pack) over combos
    (factors/reprojection.py:254-367) in one kernel launch.  Inputs are the
    per-combo endpoint states: T1/T2 (S,4,4), v1/v2 (S,6), t1/t2/t (S,).
    f32 only (the TPU production dtype); callers keep the pure-JAX path for
    f64/CPU.
    """
    return _packs_impl(T1, v1, T2, v2, t1, t2, t, interpret=interpret)
