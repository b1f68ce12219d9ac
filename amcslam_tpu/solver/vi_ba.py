"""Visual-inertial bundle adjustment (BASELINE config 4).

The reference fork deleted ORB-SLAM3's inertial optimizers but kept the
preintegration machinery (SURVEY.md §2.12); this module provides the
inertial BA the benchmark suite requires: per-keyframe inertial states
(R, p, v) + gyro/accel biases, preintegrated IMU factors between consecutive
keyframes, bias random-walk factors, and mono reprojection edges against
free landmarks. Small windows solve densely (poses + landmarks jointly);
the landmark axis can reuse the Schur machinery of solver/ba.py when scaled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors import imu as imu_factor
from ..factors.imu import InertialState, imu_residual_jac, retract_inertial
from ..factors.reprojection import project_pinhole, project_jac_pinhole
from ..ops import imu, lie
from . import robust
from .lm import LMProblem, lm_optimize


class VIBAData(NamedTuple):
    # IMU factors between consecutive KFs (K-1 of them, padded allowed)
    pre: imu.PreintState        # batched PreintState, leading dim (Ki,)
    imu_pairs: jax.Array        # (Ki,2) int32
    imu_valid: jax.Array        # (Ki,) bool
    bg_lin: jax.Array           # (Ki,3) linearization bias of each window
    ba_lin: jax.Array           # (Ki,3)
    walk_info: jax.Array        # (6,6) bias random-walk information per step
    gravity: jax.Array          # (3,)
    # reprojection edges
    obs: jax.Array              # (E,2)
    obs_kf: jax.Array           # (E,) int32
    obs_lm: jax.Array           # (E,) int32
    obs_cam: jax.Array          # (E,) int32
    w: jax.Array                # (E,)
    obs_valid: jax.Array        # (E,) bool
    Tbc: jax.Array              # (C,4,4)
    K_intr: jax.Array           # (C,4)
    pose_fixed: jax.Array       # (K,) bool
    huber_mono: float = 2.447   # sqrt(5.991)


class VIBAState(NamedTuple):
    R: jax.Array   # (K,3,3)
    p: jax.Array   # (K,3)
    v: jax.Array   # (K,3)
    bg: jax.Array  # (K,3)
    ba: jax.Array  # (K,3)
    X: jax.Array   # (L,3)


def _reproj_eval(data: VIBAData, state: VIBAState):
    def one(obs, kf, lm, cam):
        Twb = lie.se3_matrix(state.R[kf], state.p[kf])
        Xb = lie.transform_point(lie.se3_inv(Twb), state.X[lm])
        Tcb = lie.se3_inv(data.Tbc[cam])
        Xc = lie.transform_point(Tcb, Xb)
        r = obs - project_pinhole(data.K_intr[cam], Xc)
        pj = project_jac_pinhole(data.K_intr[cam], Xc)
        Rcb = Tcb[:3, :3]
        # d r / d [dphi, dp, dv]: pose retraction here is R<-R exp(dphi),
        # p <- p + dp (NOT the SE3 right-retraction of the GP solver)
        # Xb = R^T (X - p):  dXb/dphi = hat(Xb) R^T R ... derive via chain:
        dXb_dphi = lie.hat(Xb)  # R <- R exp(phi): Xb' = exp(-phi) Xb
        dXb_dp = -state.R[kf].T
        J_pose = jnp.concatenate(
            [-pj @ Rcb @ dXb_dphi, -pj @ Rcb @ dXb_dp, jnp.zeros((2, 3), r.dtype)],
            axis=1,
        )  # (2,9)
        J_lm = -pj @ Rcb @ state.R[kf].T
        return r, J_pose, J_lm, Xc[2]

    return jax.vmap(one)(data.obs, data.obs_kf, data.obs_lm, data.obs_cam)


def _imu_eval(data: VIBAData, state: VIBAState):
    def one(pre, pair, bg_lin, ba_lin):
        i, j = pair[0], pair[1]
        si = InertialState(R=state.R[i], p=state.p[i], v=state.v[i])
        sj = InertialState(R=state.R[j], p=state.p[j], v=state.v[j])
        r, Ji, Jj, Jbg, Jba = imu_residual_jac(
            si, sj, state.bg[i], state.ba[i], pre, bg_lin, ba_lin, data.gravity
        )
        info = jnp.linalg.inv(
            pre.C[:9, :9] + 1e-10 * jnp.eye(9, dtype=r.dtype)
        )
        return r, Ji, Jj, Jbg, Jba, info

    return jax.vmap(one)(data.pre, data.imu_pairs, data.bg_lin, data.ba_lin)


def make_vi_ba_problem(data: VIBAData) -> LMProblem:
    """Dense joint VI-BA problem. Parameter layout per KF: [dphi,dp,dv,dbg,dba]
    (15); landmarks appended (3 each)."""
    K = data.pose_fixed.shape[0]
    dtype = data.obs.dtype
    delta = jnp.asarray(data.huber_mono, dtype)
    act_obs = data.obs_valid
    pose_act = (~data.pose_fixed).astype(dtype)

    def sizes(state):
        return 15 * K, state.X.shape[0]

    def chi2(state: VIBAState):
        r, _, _, _ = _reproj_eval(data, state)
        r = jnp.where(act_obs[:, None], r, 0.0)
        s = jnp.sum(r * r, -1) * data.w
        rho0, _ = robust.huber_rho01(s, delta, True)
        c = jnp.sum(jnp.where(act_obs, rho0, 0.0))

        r_i, Ji, Jj, Jbg, Jba, info = _imu_eval(data, state)
        r_i = jnp.where(data.imu_valid[:, None], r_i, 0.0)
        c += jnp.sum(jnp.einsum("ei,eij,ej->e", r_i, info, r_i))

        # bias random walk between consecutive KFs of each IMU pair
        i_, j_ = data.imu_pairs[:, 0], data.imu_pairs[:, 1]
        db = jnp.concatenate(
            [state.bg[j_] - state.bg[i_], state.ba[j_] - state.ba[i_]], axis=1
        )
        db = jnp.where(data.imu_valid[:, None], db, 0.0)
        c += jnp.sum(jnp.einsum("ei,ij,ej->e", db, data.walk_info, db))
        return c

    def linearize(state: VIBAState):
        P, L = sizes(state)
        N = P + 3 * L
        H = jnp.zeros((N, N), dtype)
        b = jnp.zeros((N,), dtype)

        # reprojection
        r, Jp, Jl, _ = _reproj_eval(data, state)
        m = act_obs[:, None]
        r = jnp.where(m, r, 0.0)
        Jp = jnp.where(m[..., None], Jp, 0.0)
        Jl = jnp.where(m[..., None], Jl, 0.0)
        Jp = Jp * pose_act[data.obs_kf][:, None, None]
        s = jnp.sum(r * r, -1) * data.w
        _, rho1 = robust.huber_rho01(s, delta, True)
        wgt = jnp.where(act_obs, data.w * rho1, 0.0)
        cols_p = 15 * data.obs_kf[:, None] + jnp.arange(9)[None, :]
        cols_l = P + 3 * data.obs_lm[:, None] + jnp.arange(3)[None, :]
        cols = jnp.concatenate([cols_p, cols_l], axis=1)  # (E,12)
        J = jnp.concatenate([Jp, Jl], axis=2)  # (E,2,12)
        JW = J * wgt[:, None, None]
        H = H.at[cols[:, :, None], cols[:, None, :]].add(
            jnp.einsum("eri,erj->eij", JW, J)
        )
        b = b.at[cols].add(-jnp.einsum("eri,er->ei", JW, r))

        # IMU factors
        r_i, Ji, Jj, Jbg, Jba, info = _imu_eval(data, state)
        mi = data.imu_valid[:, None]
        r_i = jnp.where(mi, r_i, 0.0)
        Ji = jnp.where(mi[..., None], Ji, 0.0)
        Jj = jnp.where(mi[..., None], Jj, 0.0)
        Jbg = jnp.where(mi[..., None], Jbg, 0.0)
        Jba = jnp.where(mi[..., None], Jba, 0.0)
        i_, j_ = data.imu_pairs[:, 0], data.imu_pairs[:, 1]
        Ji = Ji * pose_act[i_][:, None, None]
        Jj = Jj * pose_act[j_][:, None, None]
        Jfull = jnp.concatenate([Ji, Jbg, Jba, Jj], axis=2)  # (Ki,9,24)
        colsi = jnp.concatenate(
            [
                15 * i_[:, None] + jnp.arange(15)[None, :],
                15 * j_[:, None] + jnp.arange(9)[None, :],
            ],
            axis=1,
        )  # (Ki,24)
        JWi = jnp.einsum("eab,ebc->eac", info, Jfull)
        H = H.at[colsi[:, :, None], colsi[:, None, :]].add(
            jnp.einsum("eri,erj->eij", JWi, Jfull)
        )
        b = b.at[colsi].add(-jnp.einsum("eri,er->ei", JWi, r_i))

        # bias random walk (on [bg_i, ba_i] -> [bg_j, ba_j])
        db = jnp.concatenate(
            [state.bg[j_] - state.bg[i_], state.ba[j_] - state.ba[i_]], axis=1
        )
        db = jnp.where(mi, db, 0.0)
        E = db.shape[0]
        Jw = jnp.tile(
            jnp.concatenate([-jnp.eye(6, dtype=dtype), jnp.eye(6, dtype=dtype)], 1)[None],
            (E, 1, 1),
        )
        Jw = jnp.where(mi[..., None], Jw, 0.0)
        colsw = jnp.concatenate(
            [
                15 * i_[:, None] + 9 + jnp.arange(6)[None, :],
                15 * j_[:, None] + 9 + jnp.arange(6)[None, :],
            ],
            axis=1,
        )
        JWw = jnp.einsum("ab,ebc->eac", data.walk_info, Jw)
        H = H.at[colsw[:, :, None], colsw[:, None, :]].add(
            jnp.einsum("eri,erj->eij", JWw, Jw)
        )
        b = b.at[colsw].add(-jnp.einsum("eri,er->ei", JWw, db))

        act_vec = jnp.concatenate(
            [jnp.repeat(pose_act, 15), jnp.ones(3 * L, dtype)]
        )
        H = H * act_vec[:, None] * act_vec[None, :]
        b = b * act_vec
        return H, b, act_vec

    def max_abs_diag(lin):
        H, b, act_vec = lin
        return jnp.max(jnp.abs(jnp.diagonal(H)) * act_vec)

    def solve(lin, lam):
        H, b, act_vec = lin
        Hd = H + jnp.diag(lam * act_vec + (1.0 - act_vec))
        Lc, lower = jax.scipy.linalg.cho_factor(Hd)
        dx = jax.scipy.linalg.cho_solve((Lc, lower), b)
        return dx, dx @ dx, dx @ b

    def retract(state: VIBAState, dx):
        P = 15 * K
        d = dx[:P].reshape(K, 15)
        dX = dx[P:].reshape(-1, 3)
        R = jax.vmap(lambda Ri, di: Ri @ lie.exp_so3(di))(state.R, d[:, :3])
        return VIBAState(
            R=R,
            p=state.p + d[:, 3:6],
            v=state.v + d[:, 6:9],
            bg=state.bg + d[:, 9:12],
            ba=state.ba + d[:, 12:15],
            X=state.X + dX,
        )

    return LMProblem(chi2, linearize, max_abs_diag, solve, retract)


def vi_ba(data: VIBAData, state: VIBAState, num_iterations=10, lambda_init=1e-2):
    problem = make_vi_ba_problem(data)
    return lm_optimize(problem, state, num_iterations, lambda_init=lambda_init)
