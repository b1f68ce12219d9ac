"""Sparse-GP motion-prior factor between consecutive (pose, twist) states.

Rebuild of `EdgeGaussianPrior` (G2oTypes.h:147-184, G2oTypes.cc:102-125):

    r = [ log(T1^-1 T2) - dt * v1 ;  Jr^-1(xi12) v2 - v1 ]   (12,)
    information = QiInv(dt)

with the hand-derived Jacobians incl. the first-order BCH velocity coupling
term -1/2 ad(v2) (...). Unit-tested against `jax.jacfwd` of the residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.precision import exact, smm


@exact
def gp_prior_residual(T1, v1, t1, T2, v2, t2):
    """12-dim GP prior residual (EdgeGaussianPrior::computeError)."""
    xi12 = lie.log_se3(smm(lie.se3_inv(T1), T2))
    r_pose = xi12 - (t2 - t1) * v1
    r_vel = smm(lie.right_jacobian_pose3_inv(xi12), v2) - v1
    return jnp.concatenate([r_pose, r_vel])


@exact
def gp_prior_residual_jac(T1, v1, t1, T2, v2, t2):
    """Residual + Jacobians wrt both 12-dof states.

    Returns (r, J1 (12,12), J2 (12,12)); transcription of
    EdgeGaussianPrior::linearizeOplus (G2oTypes.cc:102-125):

      dr/dxi1 = [ -Jr^-1(xi) Ad(T12)^-1 ; -1/2 ad(v2) * (that) ]
      dr/dv1  = [ -dt I ; -I ]
      dr/dxi2 = [ Jr^-1(xi) ; -1/2 ad(v2) Jr^-1(xi) ]
      dr/dv2  = [ 0 ; Jr^-1(xi) ]
    """
    dtype = T1.dtype
    T12 = smm(lie.se3_inv(T1), T2)
    xi = lie.log_se3(T12)
    Jr_inv = lie.right_jacobian_pose3_inv(xi)
    ad_v2 = lie.se3_ad(v2)
    dt = t2 - t1

    r_pose = xi - dt * v1
    r_vel = smm(Jr_inv, v2) - v1
    r = jnp.concatenate([r_pose, r_vel])

    eye6 = jnp.eye(6, dtype=dtype)
    z6 = jnp.zeros((6, 6), dtype=dtype)

    dxi_dT1 = -smm(Jr_inv, lie.adj_se3(lie.se3_inv(T12)))
    J1 = jnp.concatenate(
        [
            jnp.concatenate([dxi_dT1, -dt * eye6], axis=1),
            jnp.concatenate([-0.5 * smm(ad_v2, dxi_dT1), -eye6], axis=1),
        ],
        axis=0,
    )
    J2 = jnp.concatenate(
        [
            jnp.concatenate([Jr_inv, z6], axis=1),
            jnp.concatenate([-0.5 * smm(ad_v2, Jr_inv), Jr_inv], axis=1),
        ],
        axis=0,
    )
    return r, J1, J2
