"""IMU preintegration factor (visual-inertial BA, BASELINE config 4).

Standard preintegrated-IMU residual (Forster et al. / the inertial edges of
upstream ORB-SLAM3 that the AMC fork deleted; ImuTypes machinery retained at
SURVEY.md §2.12) between two inertial states (R, p, v) with shared gyro/acc
biases:

  r_dR = log( dR(b)^T R_i^T R_j )
  r_dV = R_i^T (v_j - v_i - g dT)            - dV(b)
  r_dP = R_i^T (p_j - p_i - v_i dT - 1/2 g dT^2) - dP(b)

with dR/dV/dP the first-order bias-corrected preintegrated deltas and
information = C[:9,:9]^-1. Jacobians via autodiff of the retraction
(R <- R exp(dphi), p/v/b additive), which XLA fuses into the vmapped batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import imu, lie
from ..ops.precision import exact

GRAVITY = jnp.asarray([0.0, 0.0, -9.81])


class InertialState(NamedTuple):
    R: jax.Array   # (3,3)
    p: jax.Array   # (3,)
    v: jax.Array   # (3,)


@exact
def imu_residual(
    si: InertialState,
    sj: InertialState,
    bg: jax.Array,
    ba: jax.Array,
    pre: imu.PreintState,
    bias_g_lin: jax.Array,
    bias_a_lin: jax.Array,
    gravity: jax.Array | None = None,
) -> jax.Array:
    """9-dim preintegration residual at bias (bg, ba); the preintegration was
    computed at (bias_g_lin, bias_a_lin)."""
    g = GRAVITY.astype(si.p.dtype) if gravity is None else gravity
    dT = pre.dT
    dR, dV, dP = imu.delta_with_bias(pre, bg - bias_g_lin, ba - bias_a_lin)
    r_R = lie.log_so3(dR.T @ si.R.T @ sj.R)
    r_V = si.R.T @ (sj.v - si.v - g * dT) - dV
    r_P = si.R.T @ (sj.p - si.p - si.v * dT - 0.5 * g * dT * dT) - dP
    return jnp.concatenate([r_R, r_V, r_P])


def retract_inertial(s: InertialState, d: jax.Array) -> InertialState:
    """9-dof retraction [dphi, dp, dv]."""
    return InertialState(R=s.R @ lie.exp_so3(d[:3]), p=s.p + d[3:6], v=s.v + d[6:9])


def imu_residual_jac(si, sj, bg, ba, pre, bg_lin, ba_lin, gravity=None):
    """Residual + Jacobians wrt (si 9, sj 9, bg 3, ba 3) — autodiff, exact."""
    dtype = si.p.dtype

    def f(d):
        return imu_residual(
            retract_inertial(si, d[:9]),
            retract_inertial(sj, d[9:18]),
            bg + d[18:21],
            ba + d[21:24],
            pre,
            bg_lin,
            ba_lin,
            gravity,
        )

    z = jnp.zeros(24, dtype)
    r = f(z)
    J = jax.jacfwd(f)(z)
    return r, J[:, :9], J[:, 9:18], J[:, 18:21], J[:, 21:24]
