"""Debug scaffolding (rebuild of the reference's edge-dump helpers).

The reference ships ad-hoc debugging inside the edges — GetJacobian /
GetHessian stdout dumps (G2oTypes.h:167-396), `Optimizer::saveMatrix` CSV
dumps (Optimizer.cc:688-711), and the central-difference checker
`jacobianNumercialDiff` (Pose3utils.cc:82-109). Equivalents:
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def save_matrix(path: str, matrix) -> None:
    """CSV dump (Optimizer::saveMatrix parity)."""
    np.savetxt(path, np.asarray(matrix), delimiter=",")


def numerical_jacobian(residual_fn, retract_fn, state, dim: int, h: float = 1e-6):
    """Central-difference Jacobian of residual_fn at `state` wrt the given
    retraction — the `jacobianNumercialDiff` analog, usable on any factor."""
    z = np.zeros(dim)
    cols = []
    for k in range(dim):
        d = z.copy()
        d[k] = h
        rp = np.asarray(residual_fn(retract_fn(state, jnp.asarray(d))))
        rm = np.asarray(residual_fn(retract_fn(state, jnp.asarray(-d))))
        cols.append((rp - rm) / (2 * h))
    return np.stack(cols, axis=-1)


def check_jacobian(residual_fn, retract_fn, state, analytic, dim: int,
                   atol: float = 1e-6, h: float = 1e-6):
    """Compare an analytic Jacobian against central differences; returns
    (max_abs_err, numeric_jacobian)."""
    J_num = numerical_jacobian(residual_fn, retract_fn, state, dim, h)
    err = float(np.abs(np.asarray(analytic) - J_num).max())
    return err, J_num


def edge_hessian(J_blocks, information):
    """GetHessian parity: J^T Omega J for a concatenated edge Jacobian."""
    J = jnp.concatenate(list(J_blocks), axis=-1)
    return J.T @ jnp.asarray(information) @ J
