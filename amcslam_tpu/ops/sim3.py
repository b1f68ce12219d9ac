"""Sim(3) group kernels matching g2o's conventions (types/sim3.h).

Used by loop closure: `OptimizeSim3` (two-keyframe similarity refinement)
and `OptimizeEssentialGraph` (Sim3 pose graph, Optimizer.cc:1434-2048).

g2o conventions (different from our SE(3) module!):
  * 7-tangent ordering: [omega (3), upsilon (3), sigma (1)] — rotation first
  * vertex update is LEFT-multiplicative: S <- exp(delta) * S
    (types_seven_dof_expmap.h:60-69), with delta[6] zeroed when scale fixed
  * exp via Strasdat's W matrix: R = exp(omega), s = e^sigma, t = W upsilon,
    W = A hat(omega) + B hat(omega)^2 + C I (sim3.h:70-142)
  * log solves upsilon = W^-1 t (sim3.h:148-225)

Elements are stored as a pytree (s: (), R: (3,3), t: (3,)); `matrix` gives
the 4x4 [[sR, t], [0, 1]] form. All ops are vmap-friendly and NaN-safe via
Taylor-series `where` branches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie
from .precision import exact


class Sim3(NamedTuple):
    s: jax.Array  # () scale
    R: jax.Array  # (3,3)
    t: jax.Array  # (3,)

    def matrix(self):
        top = jnp.concatenate([self.s * self.R, self.t[:, None]], axis=1)
        bottom = jnp.concatenate(
            [jnp.zeros((1, 3), self.R.dtype), jnp.ones((1, 1), self.R.dtype)],
            axis=1,
        )
        return jnp.concatenate([top, bottom], axis=0)


def identity(dtype=jnp.float64) -> Sim3:
    return Sim3(
        s=jnp.ones((), dtype), R=jnp.eye(3, dtype=dtype), t=jnp.zeros(3, dtype)
    )


def from_se3(T: jax.Array) -> Sim3:
    return Sim3(s=jnp.ones((), T.dtype), R=T[:3, :3], t=T[:3, 3])


@exact
def mul(a: Sim3, b: Sim3) -> Sim3:
    """(s1,R1,t1)*(s2,R2,t2) = (s1 s2, R1 R2, s1 R1 t2 + t1)."""
    return Sim3(s=a.s * b.s, R=a.R @ b.R, t=a.s * (a.R @ b.t) + a.t)


@exact
def inv(a: Sim3) -> Sim3:
    """S^-1 = (1/s, R^T, -(1/s) R^T t) (sim3.h:231-234)."""
    Rt = a.R.T
    return Sim3(s=1.0 / a.s, R=Rt, t=-(Rt @ a.t) / a.s)


@exact
def act(a: Sim3, x: jax.Array) -> jax.Array:
    """map(): s R x + t."""
    return a.s * (a.R @ x) + a.t


def _W_coeffs(theta2, sigma, s, dtype):
    """(A, B, C) of W = A hat + B hat^2 + C I, all four branches NaN-safe."""
    eps2 = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-4, dtype)
    epss = jnp.asarray(1e-5 if dtype == jnp.float64 else 1e-3, dtype)
    small_t = theta2 < eps2
    small_s = jnp.abs(sigma) < epss
    th = jnp.sqrt(jnp.where(small_t, jnp.ones_like(theta2), theta2))
    sig_safe = jnp.where(small_s, jnp.ones_like(sigma), sigma)
    sin_t, cos_t = jnp.sin(th), jnp.cos(th)
    sig2 = sig_safe * sig_safe

    # sigma ~ 0 branch
    C0 = jnp.ones_like(sigma)
    A0 = jnp.where(small_t, 0.5 - theta2 / 24.0, (1.0 - cos_t) / theta2)
    B0 = jnp.where(
        small_t, 1.0 / 6.0 - theta2 / 120.0, (th - sin_t) / (theta2 * th)
    )
    # general sigma
    C1 = (s - 1.0) / sig_safe
    A1_smt = ((sig_safe - 1.0) * s + 1.0) / sig2
    B1_smt = ((0.5 * sig2 - sig_safe + 1.0) * s) / (sig2 * sig_safe)
    a_ = s * sin_t
    b_ = s * cos_t
    c_ = theta2 + sig2
    A1_gen = (a_ * sig_safe + (1.0 - b_) * th) / (th * c_)
    B1_gen = (C1 - ((b_ - 1.0) * sig_safe + a_ * th) / c_) / theta2
    A1 = jnp.where(small_t, A1_smt, A1_gen)
    B1 = jnp.where(small_t, B1_smt, B1_gen)

    A = jnp.where(small_s, A0, A1)
    B = jnp.where(small_s, B0, B1)
    C = jnp.where(small_s, C0, C1)
    return A, B, C


@exact
def exp_sim3(v: jax.Array) -> Sim3:
    """7-tangent [omega, upsilon, sigma] -> Sim3 (sim3.h:70-142)."""
    omega, upsilon, sigma = v[:3], v[3:6], v[6]
    dtype = v.dtype
    s = jnp.exp(sigma)
    R = lie.exp_so3(omega)
    theta2 = jnp.dot(omega, omega)
    A, B, C = _W_coeffs(theta2, sigma, s, dtype)
    Om = lie.hat(omega)
    W = A * Om + B * (Om @ Om) + C * jnp.eye(3, dtype=dtype)
    return Sim3(s=s, R=R, t=W @ upsilon)


@exact
def log_sim3(a: Sim3) -> jax.Array:
    """Sim3 -> [omega, upsilon, sigma] (sim3.h:148-225)."""
    dtype = a.R.dtype
    sigma = jnp.log(a.s)
    omega = lie.log_so3(a.R)
    theta2 = jnp.dot(omega, omega)
    A, B, C = _W_coeffs(theta2, sigma, a.s, dtype)
    Om = lie.hat(omega)
    W = A * Om + B * (Om @ Om) + C * jnp.eye(3, dtype=dtype)
    upsilon = jnp.linalg.solve(W, a.t)
    return jnp.concatenate([omega, upsilon, sigma[None]])


def sim3_error(meas: Sim3, S1: Sim3, S2: Sim3) -> jax.Array:
    """EdgeSim3 residual: log(C * S1 * S2^-1) (types_seven_dof_expmap.h:106-114)."""
    return log_sim3(mul(mul(meas, S1), inv(S2)))


def retract_left(S: Sim3, delta: jax.Array, fix_scale) -> Sim3:
    """VertexSim3Expmap::oplusImpl: S <- exp(delta) * S, delta[6]=0 if fixed."""
    delta = delta.at[6].set(jnp.where(fix_scale, 0.0, delta[6]))
    return mul(exp_sim3(delta), S)
