"""IMU preintegration on-device (rebuild of ImuTypes.cc, `Preintegrated`).

Midpoint preintegration of gyro/accel batches between keyframes with
first-order bias Jacobians and 15x15 covariance propagation
(IntegrateNewMeasurement, ImuTypes.cc:177-235), as a `lax.scan` — jittable,
differentiable, vmappable over independent preintegration windows.

The reference keeps this machinery vestigial (the MULTICAMERA pipeline never
feeds IMU data, SURVEY.md §2.12), but BASELINE config 4 requires
visual-inertial BA with these factors; see factors/imu.py and solver/vi_ba.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import lie
from .precision import exact


class PreintState(NamedTuple):
    dR: jax.Array    # (3,3) integrated rotation
    dV: jax.Array    # (3,)
    dP: jax.Array    # (3,)
    JRg: jax.Array   # (3,3) d dR / d bias_gyro
    JVg: jax.Array   # (3,3)
    JVa: jax.Array   # (3,3)
    JPg: jax.Array   # (3,3)
    JPa: jax.Array   # (3,3)
    C: jax.Array     # (15,15) covariance [dR dV dP bg ba]
    dT: jax.Array    # () total time


def init_state(dtype=jnp.float32) -> PreintState:
    eye = jnp.eye(3, dtype=dtype)
    z = jnp.zeros((3, 3), dtype)
    return PreintState(
        dR=eye, dV=jnp.zeros(3, dtype), dP=jnp.zeros(3, dtype),
        JRg=z, JVg=z, JVa=z, JPg=z, JPa=z,
        C=jnp.zeros((15, 15), dtype), dT=jnp.zeros((), dtype),
    )


@exact
def integrate(
    state: PreintState,
    acc: jax.Array,
    gyro: jax.Array,
    dt: jax.Array,
    bias_g: jax.Array,
    bias_a: jax.Array,
    Nga: jax.Array,      # (6,6) [gyro, acc] white-noise covariance / dt
    NgaWalk: jax.Array,  # (6,6) bias random-walk covariance * dt
) -> PreintState:
    """One measurement step (ImuTypes.cc:177-235 order of operations)."""
    dtype = state.dR.dtype
    a = acc - bias_a
    w = gyro - bias_g

    dP = state.dP + state.dV * dt + 0.5 * state.dR @ a * dt * dt
    dV = state.dV + state.dR @ a * dt

    Wacc = lie.hat(a)
    A = jnp.eye(9, dtype=dtype)
    B = jnp.zeros((9, 6), dtype)
    A = A.at[3:6, 0:3].set(-state.dR * dt @ Wacc)
    A = A.at[6:9, 0:3].set(-0.5 * state.dR * dt * dt @ Wacc)
    A = A.at[6:9, 3:6].set(dt * jnp.eye(3, dtype=dtype))
    B = B.at[3:6, 3:6].set(state.dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * state.dR * dt * dt)

    JPa = state.JPa + state.JVa * dt - 0.5 * state.dR * dt * dt
    JPg = state.JPg + state.JVg * dt - 0.5 * state.dR * dt * dt @ Wacc @ state.JRg
    JVa = state.JVa - state.dR * dt
    JVg = state.JVg - state.dR * dt @ Wacc @ state.JRg

    dRi = lie.exp_so3(w * dt)
    rightJ = lie.right_jacobian_so3(w * dt)
    dR = state.dR @ dRi

    A = A.at[0:3, 0:3].set(dRi.T)
    B = B.at[0:3, 0:3].set(rightJ * dt)

    C9 = A @ state.C[:9, :9] @ A.T + B @ Nga @ B.T
    C = state.C.at[:9, :9].set(C9)
    C = C.at[9:, 9:].add(NgaWalk)

    JRg = dRi.T @ state.JRg - rightJ * dt
    return PreintState(
        dR=dR, dV=dV, dP=dP, JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
        C=C, dT=state.dT + dt,
    )


def preintegrate(
    acc: jax.Array,      # (N,3)
    gyro: jax.Array,     # (N,3)
    dts: jax.Array,      # (N,)
    bias_g: jax.Array,
    bias_a: jax.Array,
    Nga: jax.Array,
    NgaWalk: jax.Array,
    valid: jax.Array | None = None,  # (N,) padding mask
) -> PreintState:
    """Scan-integrate a (padded) measurement window at a fixed bias estimate."""
    state0 = init_state(acc.dtype)
    if valid is None:
        valid = jnp.ones(acc.shape[0], bool)

    def step(s, x):
        a, w, dt, m = x
        s_new = integrate(s, a, w, dt, bias_g, bias_a, Nga, NgaWalk)
        s_out = jax.tree.map(lambda old, new: jnp.where(m, new, old), s, s_new)
        return s_out, None

    state, _ = lax.scan(step, state0, (acc, gyro, dts, valid))
    return state


@exact
def delta_with_bias(
    pre: PreintState, dbg: jax.Array, dba: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """First-order bias-corrected deltas (GetDeltaRotation/Velocity/Position):

    dR(b) = dR exp(JRg dbg);  dV(b) = dV + JVg dbg + JVa dba;
    dP(b) = dP + JPg dbg + JPa dba.
    """
    dR = pre.dR @ lie.exp_so3(pre.JRg @ dbg)
    dV = pre.dV + pre.JVg @ dbg + pre.JVa @ dba
    dP = pre.dP + pre.JPg @ dbg + pre.JPa @ dba
    return dR, dV, dP


def merge_previous(
    prev_meas: tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    meas: tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    bias_g: jax.Array,
    bias_a: jax.Array,
    Nga: jax.Array,
    NgaWalk: jax.Array,
) -> PreintState:
    """Preintegrated::MergePrevious (ImuTypes.cc:237-263): re-integrate the
    concatenation of two measurement windows at the updated bias. Each window
    is (acc (N,3), gyro (N,3), dts (N,), valid (N,))."""
    acc = jnp.concatenate([prev_meas[0], meas[0]])
    gyro = jnp.concatenate([prev_meas[1], meas[1]])
    dts = jnp.concatenate([prev_meas[2], meas[2]])
    valid = jnp.concatenate([prev_meas[3], meas[3]])
    return preintegrate(acc, gyro, dts, bias_g, bias_a, Nga, NgaWalk, valid)


def reintegrate(meas, bias_g, bias_a, Nga, NgaWalk) -> PreintState:
    """Preintegrated::Reintegrate: fresh integration at a new bias estimate
    (the measurements are retained, ImuTypes.cc:265-275)."""
    acc, gyro, dts, valid = meas
    return preintegrate(acc, gyro, dts, bias_g, bias_a, Nga, NgaWalk, valid)
