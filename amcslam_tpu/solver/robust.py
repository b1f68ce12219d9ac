"""Robust kernels with g2o-compatible semantics.

The reference applies `RobustKernelHuber` per edge with a per-edge delta
(robust_kernel_impl.cpp:79-92) and uses

    chi2 contribution  = rho0(s)
    H/b weighting      = rho1(s) * information     (base_edge.h:96-102,
                         base_binary_edge.hpp:91-113; the rho2 term is
                         disabled upstream)

where s = e^T Omega e. Kernels must also be removable at runtime
(`setRobustKernel(0)`, Optimizer.cc:610): `enabled=False` reproduces that.
All functions are scalar and vmapped over edges by the solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber_rho01(s: jax.Array, delta: jax.Array, enabled) -> tuple[jax.Array, jax.Array]:
    """(rho0, rho1) of the Huber kernel at squared error s.

    Inlier (s <= delta^2): rho0 = s,                rho1 = 1
    Outlier:               rho0 = 2 delta sqrt(s) - delta^2,
                           rho1 = delta / sqrt(s)
    """
    dsqr = delta * delta
    inlier = s <= dsqr
    safe_s = jnp.maximum(s, jnp.finfo(s.dtype).tiny)
    sqrte = jnp.sqrt(safe_s)
    rho0 = jnp.where(inlier, s, 2.0 * sqrte * delta - dsqr)
    rho1 = jnp.where(inlier, jnp.ones_like(s), delta / sqrte)
    rho0 = jnp.where(enabled, rho0, s)
    rho1 = jnp.where(enabled, rho1, jnp.ones_like(s))
    return rho0, rho1
