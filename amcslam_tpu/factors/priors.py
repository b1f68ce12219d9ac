"""Small prior/regularizer factors.

  * velocity regularizer  — EdgeVelocity (G2oTypes.h:497-521): soft zero
    prior on the vertical (z) translational velocity, info = QcInv[2,2].
  * extrinsic rotation prior — EdgeExtrinsicPrior (G2oTypes.h:471-495).
  * velocity-only reprojection — EdgeVelReproj (G2oTypes.h:522-547,
    G2oTypes.cc:497-510), the residual of the MC-RANSAC velocity model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.precision import exact
from .reprojection import project_pinhole, project_jac_pinhole


def velocity_residual(v: jax.Array) -> jax.Array:
    """r = v[2] (selects vertical velocity; A = [0,0,1,0,0,0])."""
    return v[2:3]


def velocity_jac(v: jax.Array) -> jax.Array:
    """(1,12) Jacobian wrt the pose-vel vertex: zeros except d r/d v[2]."""
    J = jnp.zeros((1, 12), dtype=v.dtype)
    return J.at[0, 8].set(1.0)  # slot 6+2 in [dxi(6), dv(6)]


@exact
def extrinsic_prior_residual(Tbc: jax.Array, R_prior: jax.Array) -> jax.Array:
    """r = log(R_prior^-1 * Rbc)  (rotation-only extrinsic anchor)."""
    return lie.log_so3(R_prior.T @ Tbc[:3, :3])


@exact
def extrinsic_prior_jac(Tbc: jax.Array, R_prior: jax.Array) -> jax.Array:
    """(3,6) Jacobian wrt Tbc <- Tbc exp(de): [0, Jr^-1(r)]."""
    r = extrinsic_prior_residual(Tbc, R_prior)
    J = jnp.zeros((3, 6), dtype=Tbc.dtype)
    return J.at[:, 3:].set(lie.right_jacobian_so3_inv(r))


@exact
def vel_reproj_residual(v, T, dt, Tbc, K, Xw, obs):
    """err = obs - pi((T exp(v dt) Tbc)^-1 Xw)  (EdgeVelReproj::computeError)."""
    Twc = T @ lie.exp_se3(v * dt) @ Tbc
    Xc = lie.transform_point(lie.se3_inv(Twc), Xw)
    return obs - project_pinhole(K, Xc)


@exact
def vel_reproj_jac(v, T, dt, Tbc, K, Xw, obs):
    """Residual + (2,6) Jacobian wrt the twist vertex (G2oTypes.cc:497-510).

    J = -proj_jac * [ -Tcb exp(-v dt) CircleDot(Xb) Jr(-v dt) dt ]_{3x6}
    with Xb = T^-1 Xw.
    """
    dxi = v * dt
    Tcb1 = lie.se3_inv(Tbc) @ lie.exp_se3(-dxi)
    Xb = lie.transform_point(lie.se3_inv(T), Xw)
    Xc = lie.transform_point(Tcb1, Xb)
    r = obs - project_pinhole(K, Xc)
    pj = project_jac_pinhole(K, Xc)
    M = Tcb1 @ lie.circle_dot(Xb) @ lie.right_jacobian_pose3(-dxi) * dt
    return r, pj @ M[:3, :]
