"""Windowed local GP bundle adjustment with landmark Schur complement.

TPU-native rebuild of `Optimizer::LocalGPBA` (Optimizer.cc:713-1432) and the
g2o BlockSolver Schur machinery (Thirdparty/g2o/g2o/core/block_solver.h:131-172):

  graph = { temporal window of pose-vel KFs (prev KF + covisible KFs fixed),
            per-async-camera extrinsic vertices (fixed unless refined),
            landmarks (marginalized) }
  edges = { velocity regularizers, GP motion priors along the chain,
            extrinsic rotation priors,
            async-camera GP-interpolated mono reprojections (KF + non-KF GPObs),
            GP-interpolated stereo reprojections (non-KF stereo obs),
            stereo-camera mono/stereo reprojections at KF timestamps }

TPU mapping: all residuals/Jacobians evaluate as one vmapped batch per edge
type; the block Hessian is assembled with segment-sums (pose-pair blocks are
deduplicated by structure id before scattering — there are only O(K*C)
distinct column sets) plus one scatter-add for the landmark coupling W; the
Schur complement Hpp - W Hll^-1 W^T is two large dense contractions on the
MXU; the reduced system solves with dense Cholesky. The trust-region loop is
the shared g2o-exact LM driver (solver/lm.py).

Dynamic outlier sets are masks; dynamic graph topology is padding — shapes
stay static across LM iterations and across typical windows (bucket sizes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..factors import gp_prior, priors, reprojection
from ..ops import lie
from . import robust
from .lm import LMProblem, lm_optimize

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
TH_HUBER_MONO = float(np.sqrt(5.991))
TH_HUBER_STEREO = float(np.sqrt(7.815))
TH_HUBER_GP = 21.026  # BundleAdjustment GP-prior delta (Optimizer.cc:130)


class LocalBAData(NamedTuple):
    # --- pose vertices (K = window + fixed anchors)
    times: jax.Array          # (K,)
    pose_fixed: jax.Array     # (K,) bool
    vel_valid: jax.Array      # (K,) bool — velocity edge per optimizable KF
    qcinv22: jax.Array        # scalar
    # --- GP prior chain
    gp_pairs: jax.Array       # (Ng,2) int32 (i -> j consecutive)
    gp_qi_inv: jax.Array      # (Ng,12,12)
    gp_valid: jax.Array       # (Ng,) bool
    gp_huber: jax.Array       # () bool — GBA uses delta=21.026, LocalGPBA none
    # --- camera rig
    Tbc_stereo: jax.Array     # (4,4) stereo-camera extrinsic (not a vertex)
    K_stereo: jax.Array       # (4,)
    bf: jax.Array             # ()
    K_async: jax.Array        # (Cx,4) async camera intrinsics
    ext_fixed: jax.Array      # (Cx,) bool — extrinsic vertices fixed
    R_prior: jax.Array        # (Cx,3,3) extrinsic rotation priors
    ext_info: jax.Array       # (Cx,3,3) prior information
    # --- async-camera GP mono edges (EdgeMonoGPExtrinsic; KF + GPObs)
    mg_pair: jax.Array        # (Em,2) int32 pose pair (i=earlier, j=later)
    mg_lm: jax.Array          # (Em,) int32
    mg_cam: jax.Array         # (Em,) int32 async camera (= extrinsic vertex)
    mg_t: jax.Array           # (Em,)
    mg_obs: jax.Array         # (Em,2)
    mg_w: jax.Array           # (Em,)
    mg_valid: jax.Array       # (Em,) bool
    mg_close: jax.Array       # (Em,) bool
    mg_sid: jax.Array         # (Em,) int32 structure id (unique (pair,cam)
                              # column set; padded edges -> dump segment)
    mg_sid_cols: jax.Array    # (Sm,30) int32 column indices per structure
    # --- GP stereo edges (EdgeStereoGP; non-KF stereo obs)
    sg_pair: jax.Array        # (Eg,2) int32
    sg_lm: jax.Array          # (Eg,) int32
    sg_t: jax.Array           # (Eg,)
    sg_obs: jax.Array         # (Eg,3)
    sg_w: jax.Array           # (Eg,)
    sg_valid: jax.Array       # (Eg,) bool
    sg_sid: jax.Array         # (Eg,) int32
    sg_sid_cols: jax.Array    # (Sg,24) int32
    # --- stereo-camera edges at KF time (EdgeMono/EdgeStereo)
    st_pose: jax.Array        # (Es,) int32
    st_lm: jax.Array          # (Es,) int32
    st_obs: jax.Array         # (Es,3)
    st_w: jax.Array           # (Es,)
    st_valid: jax.Array       # (Es,) bool
    st_is_stereo: jax.Array   # (Es,) bool
    st_close: jax.Array       # (Es,) bool

    @property
    def n_poses(self):
        return self.times.shape[0]

    @property
    def n_ext(self):
        return self.K_async.shape[0]


class BAState(NamedTuple):
    T: jax.Array     # (K,4,4)
    v: jax.Array     # (K,6)
    Text: jax.Array  # (Cx,4,4)
    X: jax.Array     # (L,3)


def _inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate) — no LU on tiny blocks."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
        ],
        -2,
    )
    det = a * co[..., 0, 0] + b * co[..., 1, 0] + c * co[..., 2, 0]
    return co / det[..., None, None]


def _pair_packs(data: LocalBAData, state: BAState, sid_cols):
    """Per-structure GP pair packs: unique (pose_i, pose_j) chains computed
    once (~K structures) and gathered per edge — see
    factors/reprojection.py gp_pair_pack."""
    i_s = sid_cols[:, 0] // 12
    j_s = sid_cols[:, 12] // 12
    return jax.vmap(
        lambda i, j: reprojection.gp_pair_pack(
            state.T[i], state.v[i], state.T[j], state.v[j]
        )
    )(i_s, j_s)


def _mono_gp_eval(data: LocalBAData, state: BAState):
    packs = _pair_packs(data, state, data.mg_sid_cols)
    pack_e = jax.tree.map(lambda a: a[data.mg_sid], packs)

    def one(pair, lm, cam, t, obs, pack):
        i, j = pair[0], pair[1]
        return reprojection.mono_gp_residual_jac_packed(
            pack, state.T[i], state.v[i], data.times[i], data.times[j],
            t, state.Text[cam], data.K_async[cam], state.X[lm], obs,
        )

    return jax.vmap(one)(
        data.mg_pair, data.mg_lm, data.mg_cam, data.mg_t, data.mg_obs, pack_e
    )


def _stereo_gp_eval(data: LocalBAData, state: BAState):
    packs = _pair_packs(data, state, data.sg_sid_cols)
    pack_e = jax.tree.map(lambda a: a[data.sg_sid], packs)

    def one(pair, lm, t, obs, pack):
        i, j = pair[0], pair[1]
        return reprojection.stereo_gp_residual_jac_packed(
            pack, state.T[i], state.v[i], data.times[i], data.times[j],
            t, data.Tbc_stereo, data.K_stereo, data.bf, state.X[lm], obs,
        )

    return jax.vmap(one)(data.sg_pair, data.sg_lm, data.sg_t, data.sg_obs, pack_e)


def _stereo_eval(data: LocalBAData, state: BAState):
    def one(p, lm, obs, is_stereo):
        r3, J3, Jl, Xc = reprojection.stereo_residual_jac(
            state.T[p], data.Tbc_stereo, data.K_stereo, data.bf, state.X[lm], obs
        )
        row = jnp.where(
            is_stereo, jnp.ones(3, r3.dtype), jnp.asarray([1, 1, 0], r3.dtype)
        )
        return r3 * row, J3 * row[:, None], Jl * row[:, None], Xc[2]

    return jax.vmap(one)(data.st_pose, data.st_lm, data.st_obs, data.st_is_stereo)


def _gp_chain_eval(data: LocalBAData, state: BAState):
    def one(pair):
        i, j = pair[0], pair[1]
        return gp_prior.gp_prior_residual_jac(
            state.T[i], state.v[i], data.times[i],
            state.T[j], state.v[j], data.times[j],
        )

    return jax.vmap(one)(data.gp_pairs)




def _mono_gp_residuals(data: LocalBAData, state: BAState):
    """Residual-only async-camera GP evaluation (chi2 path — avoids building
    the Jacobian chains XLA may not fully DCE through vmap)."""

    def one(pair, lm, cam, t, obs):
        i, j = pair[0], pair[1]
        r, _ = reprojection.mono_gp_residual(
            state.T[i], state.v[i], data.times[i],
            state.T[j], state.v[j], data.times[j],
            t, state.Text[cam], data.K_async[cam], state.X[lm], obs,
        )
        return r

    return jax.vmap(one)(data.mg_pair, data.mg_lm, data.mg_cam, data.mg_t, data.mg_obs)


def _stereo_gp_residuals(data: LocalBAData, state: BAState):
    def one(pair, lm, t, obs):
        i, j = pair[0], pair[1]
        eye = jnp.eye(6, dtype=state.T.dtype)
        from ..ops import gp as _gp

        Twb, _ = _gp.query_pose_aux(
            state.T[i], state.T[j], state.v[i], state.v[j],
            data.times[i], data.times[j], t, eye, eye,
        )
        Xb = lie.transform_point(lie.se3_inv(Twb), state.X[lm])
        Xc = lie.transform_point(lie.se3_inv(data.Tbc_stereo), Xb)
        return obs - reprojection.project_stereo(data.K_stereo, data.bf, Xc)

    return jax.vmap(one)(data.sg_pair, data.sg_lm, data.sg_t, data.sg_obs)


def _stereo_residuals(data: LocalBAData, state: BAState):
    def one(p, lm, obs, is_stereo):
        r3, Xc = reprojection.stereo_residual(
            state.T[p], data.Tbc_stereo, data.K_stereo, data.bf, state.X[lm], obs
        )
        row = jnp.where(
            is_stereo, jnp.ones(3, r3.dtype), jnp.asarray([1, 1, 0], r3.dtype)
        )
        return r3 * row

    return jax.vmap(one)(data.st_pose, data.st_lm, data.st_obs, data.st_is_stereo)


def _gp_chain_residuals(data: LocalBAData, state: BAState):
    def one(pair):
        i, j = pair[0], pair[1]
        return gp_prior.gp_prior_residual(
            state.T[i], state.v[i], data.times[i],
            state.T[j], state.v[j], data.times[j],
        )

    return jax.vmap(one)(data.gp_pairs)


def make_ba_problem(
    data: LocalBAData,
    lvl_m,
    lvl_sg,
    lvl_st,
    huber_on: bool = True,
    ext_active=None,
) -> LMProblem:
    """Build LM closures for the local BA. `ext_active` (Cx,) overrides the
    extrinsic fixed flags (phase-2 refinement)."""
    dtype = data.mg_obs.dtype
    K = data.n_poses
    Cx = data.n_ext
    L_ = None  # inferred from state at trace time
    P = 12 * K + 6 * Cx

    pose_act = (~data.pose_fixed).astype(dtype)  # (K,)
    if ext_active is None:
        ext_act = (~data.ext_fixed).astype(dtype)
    else:
        ext_act = ext_active.astype(dtype)
    act_vec = jnp.concatenate(
        [jnp.repeat(pose_act, 12), jnp.repeat(ext_act, 6)]
    )  # (P,)

    act_m = data.mg_valid & lvl_m
    act_sg = data.sg_valid & lvl_sg
    act_st = data.st_valid & lvl_st
    delta_st = jnp.where(
        data.st_is_stereo,
        jnp.asarray(TH_HUBER_STEREO, dtype),
        jnp.asarray(TH_HUBER_MONO, dtype),
    )

    def chi2(state: BAState):
        r_m = _mono_gp_residuals(data, state)
        s = jnp.sum(r_m * r_m, -1) * data.mg_w
        rho0, _ = robust.huber_rho01(s, jnp.asarray(TH_HUBER_MONO, dtype), huber_on)
        c = jnp.sum(jnp.where(act_m, rho0, 0.0))

        r_sg = _stereo_gp_residuals(data, state)
        s = jnp.sum(r_sg * r_sg, -1) * data.sg_w
        rho0, _ = robust.huber_rho01(s, jnp.asarray(TH_HUBER_STEREO, dtype), huber_on)
        c += jnp.sum(jnp.where(act_sg, rho0, 0.0))

        r_st = _stereo_residuals(data, state)
        s = jnp.sum(r_st * r_st, -1) * data.st_w
        rho0, _ = robust.huber_rho01(s, delta_st, huber_on)
        c += jnp.sum(jnp.where(act_st, rho0, 0.0))

        r_g = _gp_chain_residuals(data, state)
        s = jnp.einsum("ei,eij,ej->e", r_g, data.gp_qi_inv, r_g)
        rho0, _ = robust.huber_rho01(
            s, jnp.asarray(TH_HUBER_GP, dtype), data.gp_huber
        )
        c += jnp.sum(jnp.where(data.gp_valid, rho0, 0.0))

        c += jnp.sum(
            jnp.where(data.vel_valid, data.qcinv22 * state.v[:, 2] ** 2, 0.0)
        )

        r_e = jax.vmap(priors.extrinsic_prior_residual)(state.Text, data.R_prior)
        c += jnp.sum(jnp.einsum("ci,cij,cj->c", r_e, data.ext_info, r_e))
        return c

    def linearize(state: BAState):
        L = state.X.shape[0]
        Hpp = jnp.zeros((P, P), dtype)
        bp = jnp.zeros((P,), dtype)
        # Landmark-coupling blocks accumulate with segment-sums into pose-
        # aligned layouts ((L,K,3,12) + (L,Cx,3,6)) and reshape into the dense
        # Wt at the end — TPU scatter-add costs ~9 ms per 1e6 index rows,
        # segment-sum is ~10x cheaper at this size.
        wp_rows, wp_keys = [], []  # landmark-coupling rows, one segment_sum
        We = jnp.zeros((L * Cx, 3, 6), dtype) if Cx else None
        Hll = jnp.zeros((L, 3, 3), dtype)
        bl = jnp.zeros((L, 3), dtype)

        # ===== async-camera GP mono edges =====
        r, J1, J2, Jl, Jext, Xc = _mono_gp_eval(data, state)
        # NaN-safe masking: padded/invalid edges can hold degenerate geometry
        # (z=0, dt=0) whose residuals are inf/NaN; `where` (not *mask) kills
        # them before any product, since NaN * 0 = NaN.
        m3 = act_m[:, None]
        r = jnp.where(m3, r, 0.0)
        J1 = jnp.where(m3[..., None], J1, 0.0)
        J2 = jnp.where(m3[..., None], J2, 0.0)
        Jl = jnp.where(m3[..., None], Jl, 0.0)
        Jext = jnp.where(m3[..., None], Jext, 0.0)
        s = jnp.sum(r * r, -1) * data.mg_w
        _, rho1 = robust.huber_rho01(s, jnp.asarray(TH_HUBER_MONO, dtype), huber_on)
        w = jnp.where(act_m, data.mg_w * rho1, 0.0)
        i_, j_, c_ = data.mg_pair[:, 0], data.mg_pair[:, 1], data.mg_cam
        # mask fixed vertices (their Jacobian blocks vanish)
        J1 = J1 * pose_act[i_][:, None, None]
        J2 = J2 * pose_act[j_][:, None, None]
        Jext_m = Jext * ext_act[c_][:, None, None]
        Jp = jnp.concatenate([J1, J2, Jext_m], axis=2)  # (E,2,30)
        JpW = Jp * w[:, None, None]
        cols = jnp.concatenate(
            [
                12 * i_[:, None] + jnp.arange(12)[None, :],
                12 * j_[:, None] + jnp.arange(12)[None, :],
                12 * K + 6 * c_[:, None] + jnp.arange(6)[None, :],
            ],
            axis=1,
        )  # (E,30)
        # Hpp blocks deduplicated by host-precomputed structure id: there
        # are only O(K*Cx) distinct (pose-pair, camera) column sets, and the
        # segment count is encoded in mg_sid_cols' shape (static under jit).
        # The naive (i*K+j)*Cx+c keying costs 17x more (105 ms vs 6 ms at the
        # 50 KF / 5k pt benchmark size).
        n_sid = data.mg_sid_cols.shape[0]
        Hblk = jnp.sum(JpW[:, :, :, None] * Jp[:, :, None, :], axis=1)  # (E,30,30)
        bblk = -jnp.sum(JpW * r[:, :, None], axis=1)  # (E,30)
        Hseg = jax.ops.segment_sum(Hblk, data.mg_sid, n_sid)
        bseg = jax.ops.segment_sum(bblk, data.mg_sid, n_sid)
        colseg = data.mg_sid_cols
        Hpp = Hpp.at[colseg[:, :, None], colseg[:, None, :]].add(Hseg)
        bp = bp.at[colseg].add(bseg)
        # landmark coupling + landmark system
        JlW = Jl * w[:, None, None]  # (E,2,3)
        Wblk = jnp.sum(JlW[:, :, :, None] * Jp[:, :, None, :], axis=1)  # (E,3,30)
        wp_rows.append(Wblk[:, :, :12])
        wp_keys.append(data.mg_lm * K + i_)
        wp_rows.append(Wblk[:, :, 12:24])
        wp_keys.append(data.mg_lm * K + j_)
        if Cx:
            We = We + jax.ops.segment_sum(
                Wblk[:, :, 24:30], data.mg_lm * Cx + c_, L * Cx
            )
        Hll = Hll + jax.ops.segment_sum(
            jnp.sum(JlW[:, :, :, None] * Jl[:, :, None, :], axis=1), data.mg_lm, L
        )
        bl = bl - jax.ops.segment_sum(
            jnp.sum(JlW * r[:, :, None], axis=1), data.mg_lm, L
        )

        # ===== GP stereo edges =====
        r, J1, J2, Jl, Xc = _stereo_gp_eval(data, state)
        m3 = act_sg[:, None]
        r = jnp.where(m3, r, 0.0)
        J1 = jnp.where(m3[..., None], J1, 0.0)
        J2 = jnp.where(m3[..., None], J2, 0.0)
        Jl = jnp.where(m3[..., None], Jl, 0.0)
        s = jnp.sum(r * r, -1) * data.sg_w
        _, rho1 = robust.huber_rho01(s, jnp.asarray(TH_HUBER_STEREO, dtype), huber_on)
        w = jnp.where(act_sg, data.sg_w * rho1, 0.0)
        i_, j_ = data.sg_pair[:, 0], data.sg_pair[:, 1]
        J1 = J1 * pose_act[i_][:, None, None]
        J2 = J2 * pose_act[j_][:, None, None]
        Jp = jnp.concatenate([J1, J2], axis=2)  # (E,3,24)
        JpW = Jp * w[:, None, None]
        cols = jnp.concatenate(
            [
                12 * i_[:, None] + jnp.arange(12)[None, :],
                12 * j_[:, None] + jnp.arange(12)[None, :],
            ],
            axis=1,
        )
        n_sid = data.sg_sid_cols.shape[0]
        Hseg = jax.ops.segment_sum(jnp.sum(JpW[:, :, :, None] * Jp[:, :, None, :], axis=1), data.sg_sid, n_sid)
        bseg = jax.ops.segment_sum(-jnp.sum(JpW * r[:, :, None], axis=1), data.sg_sid, n_sid)
        colseg = data.sg_sid_cols
        Hpp = Hpp.at[colseg[:, :, None], colseg[:, None, :]].add(Hseg)
        bp = bp.at[colseg].add(bseg)
        JlW = Jl * w[:, None, None]
        Wblk = jnp.sum(JlW[:, :, :, None] * Jp[:, :, None, :], axis=1)
        wp_rows.append(Wblk[:, :, :12])
        wp_keys.append(data.sg_lm * K + i_)
        wp_rows.append(Wblk[:, :, 12:24])
        wp_keys.append(data.sg_lm * K + j_)
        Hll = Hll + jax.ops.segment_sum(
            jnp.sum(JlW[:, :, :, None] * Jl[:, :, None, :], axis=1), data.sg_lm, L
        )
        bl = bl - jax.ops.segment_sum(jnp.sum(JlW * r[:, :, None], axis=1), data.sg_lm, L)

        # ===== stereo-camera KF edges =====
        r, J3, Jl, _ = _stereo_eval(data, state)
        m3 = act_st[:, None]
        r = jnp.where(m3, r, 0.0)
        J3 = jnp.where(m3[..., None], J3, 0.0)
        Jl = jnp.where(m3[..., None], Jl, 0.0)
        s = jnp.sum(r * r, -1) * data.st_w
        _, rho1 = robust.huber_rho01(s, delta_st, huber_on)
        w = jnp.where(act_st, data.st_w * rho1, 0.0)
        p_ = data.st_pose
        J3 = J3 * pose_act[p_][:, None, None]
        JpW = J3 * w[:, None, None]
        cols = 12 * p_[:, None] + jnp.arange(12)[None, :]
        Hseg = jax.ops.segment_sum(jnp.sum(JpW[:, :, :, None] * J3[:, :, None, :], axis=1), p_, K)
        bseg = jax.ops.segment_sum(-jnp.sum(JpW * r[:, :, None], axis=1), p_, K)
        colK = 12 * jnp.arange(K)[:, None] + jnp.arange(12)[None, :]
        Hpp = Hpp.at[colK[:, :, None], colK[:, None, :]].add(Hseg)
        bp = bp.at[colK].add(bseg)
        JlW = Jl * w[:, None, None]
        Wblk = jnp.sum(JlW[:, :, :, None] * J3[:, :, None, :], axis=1)
        wp_rows.append(Wblk)
        wp_keys.append(data.st_lm * K + p_)
        Hll = Hll + jax.ops.segment_sum(
            jnp.sum(JlW[:, :, :, None] * Jl[:, :, None, :], axis=1), data.st_lm, L
        )
        bl = bl - jax.ops.segment_sum(jnp.sum(JlW * r[:, :, None], axis=1), data.st_lm, L)

        # ===== GP prior chain =====
        r, J1, J2 = _gp_chain_eval(data, state)
        mg3 = data.gp_valid[:, None]
        r = jnp.where(mg3, r, 0.0)
        J1 = jnp.where(mg3[..., None], J1, 0.0)
        J2 = jnp.where(mg3[..., None], J2, 0.0)
        s = jnp.einsum("ei,eij,ej->e", r, data.gp_qi_inv, r)
        _, rho1 = robust.huber_rho01(s, jnp.asarray(TH_HUBER_GP, dtype), data.gp_huber)
        wg = jnp.where(data.gp_valid, rho1, 0.0)
        i_, j_ = data.gp_pairs[:, 0], data.gp_pairs[:, 1]
        J1 = J1 * pose_act[i_][:, None, None]
        J2 = J2 * pose_act[j_][:, None, None]
        Jp = jnp.concatenate([J1, J2], axis=2)  # (Ng,12,24)
        JW = jnp.sum(
            (data.gp_qi_inv * wg[:, None, None])[:, :, :, None] * Jp[:, None, :, :],
            axis=2,
        )  # Omega J (E,12,24)
        cols = jnp.concatenate(
            [
                12 * i_[:, None] + jnp.arange(12)[None, :],
                12 * j_[:, None] + jnp.arange(12)[None, :],
            ],
            axis=1,
        )
        Hblk = jnp.sum(JW[:, :, :, None] * Jp[:, :, None, :], axis=1)
        bblk = -jnp.sum(JW * r[:, :, None], axis=1)
        Hpp = Hpp.at[cols[:, :, None], cols[:, None, :]].add(Hblk)
        bp = bp.at[cols].add(bblk)

        # ===== velocity edges =====
        wv = jnp.where(data.vel_valid, data.qcinv22, 0.0) * pose_act
        vidx = 12 * jnp.arange(K) + 8
        Hpp = Hpp.at[vidx, vidx].add(wv)
        bp = bp.at[vidx].add(-wv * state.v[:, 2])

        # ===== extrinsic priors =====
        r_e = jax.vmap(priors.extrinsic_prior_residual)(state.Text, data.R_prior)
        J_e = jax.vmap(priors.extrinsic_prior_jac)(state.Text, data.R_prior)
        J_e = J_e * ext_act[:, None, None]
        JW_e = jnp.einsum("cij,cjk->cik", data.ext_info, J_e)
        colE = 12 * K + 6 * jnp.arange(Cx)[:, None] + jnp.arange(6)[None, :]
        Hpp = Hpp.at[colE[:, :, None], colE[:, None, :]].add(
            jnp.einsum("cri,crj->cij", JW_e, J_e)
        )
        bp = bp.at[colE].add(-jnp.einsum("cri,cr->ci", JW_e, r_e))

        Wp = jax.ops.segment_sum(
            jnp.concatenate(wp_rows, axis=0), jnp.concatenate(wp_keys), L * K
        )
        Wt_pose = (
            Wp.reshape(L, K, 3, 12).transpose(0, 2, 1, 3).reshape(L, 3, 12 * K)
        )
        if Cx:
            Wt_ext = (
                We.reshape(L, Cx, 3, 6).transpose(0, 2, 1, 3).reshape(L, 3, 6 * Cx)
            )
            Wt = jnp.concatenate([Wt_pose, Wt_ext], axis=2)
        else:
            Wt = Wt_pose
        return (Hpp, bp, Wt, Hll, bl)

    def max_abs_diag(lin):
        Hpp, bp, Wt, Hll, bl = lin
        m1 = jnp.max(jnp.abs(jnp.diagonal(Hpp)) * act_vec)
        m2 = jnp.max(jnp.abs(jnp.vectorize(jnp.diagonal, signature="(a,a)->(a)")(Hll)))
        return jnp.maximum(m1, m2)

    def solve(lin, lam):
        Hpp, bp, Wt, Hll, bl = lin
        L = Hll.shape[0]
        eye3 = jnp.eye(3, dtype=dtype)
        Hll_inv = _inv3x3(Hll + lam * eye3[None])
        Y = jnp.einsum("lab,lbp->lap", Hll_inv, Wt)  # (L,3,P)
        Hs = (
            Hpp
            + jnp.diag(lam * act_vec + (1.0 - act_vec))
            - jnp.einsum("lap,laq->pq", Y, Wt)
        )
        bs = bp - jnp.einsum("lap,la->p", Y, bl)
        Lc, lower = jax.scipy.linalg.cho_factor(Hs)
        dxp = jax.scipy.linalg.cho_solve((Lc, lower), bs)
        dxl = jnp.einsum("lab,lb->la", Hll_inv, bl - jnp.einsum("lap,p->la", Wt, dxp))
        dot_xx = dxp @ dxp + jnp.sum(dxl * dxl)
        dot_xb = dxp @ bp + jnp.sum(dxl * bl)
        return (dxp, dxl), dot_xx, dot_xb

    def retract(state: BAState, dx):
        dxp, dxl = dx
        dpose = dxp[: 12 * K].reshape(K, 12)
        dext = dxp[12 * K :].reshape(Cx, 6)
        T = jax.vmap(lambda Ti, di: Ti @ lie.exp_se3(di))(state.T, dpose[:, :6])
        Text = jax.vmap(lambda Ti, di: Ti @ lie.exp_se3(di))(state.Text, dext)
        return BAState(T=T, v=state.v + dpose[:, 6:], Text=Text, X=state.X + dxl)

    return LMProblem(chi2, linearize, max_abs_diag, solve, retract)


class LocalBAResult(NamedTuple):
    state: BAState
    ok: jax.Array            # divergence guard passed
    err_initial: jax.Array
    err_final: jax.Array
    erase_m: jax.Array       # outlier masks to erase (per edge type)
    erase_sg: jax.Array
    erase_st: jax.Array


def local_gp_ba(
    data: LocalBAData,
    state: BAState,
    b_large: bool = False,
    b_extrinsic: bool = False,
    ext_obs_count=None,
    ext_min_obs: int = 50,
):
    """Full LocalGPBA schedule (Optimizer.cc:1218-1432):

    optimize(10) with extrinsics fixed; optionally unfix extrinsics with
    >= 50 observations and optimize(opt_it = 10 or 4 if bLarge); detect
    outlier observations by chi2/depth; divergence guard
    `2*err < err_end or NaN -> abort` (skipped when bLarge).
    """
    lvl = (data.mg_valid, data.sg_valid, data.st_valid)
    lambda_init = 1e-2 if b_large else 1.0
    problem = make_ba_problem(data, *lvl, huber_on=True)
    err_initial = problem.chi2(state)
    new_state, stats = lm_optimize(problem, state, 10, lambda_init=lambda_init)

    if b_extrinsic:
        thresh = ext_min_obs
        counts = (
            ext_obs_count
            if ext_obs_count is not None
            else jax.ops.segment_sum(
                data.mg_valid.astype(jnp.int32), data.mg_cam, data.n_ext
            )
        )
        ext_active = counts >= thresh
        problem2 = make_ba_problem(data, *lvl, huber_on=True, ext_active=ext_active)
        opt_it2 = 4 if b_large else 10
        new_state, stats = lm_optimize(
            problem2, new_state, opt_it2, lambda_init=lambda_init
        )

    err_final = problem.chi2(new_state)
    ok = ~((2.0 * err_initial < err_final) | jnp.isnan(err_initial) | jnp.isnan(err_final))
    if b_large:
        ok = jnp.asarray(True)

    # outlier detection at the final state (Optimizer.cc:1259-1338)
    r_m, _, _, _, _, Xc_m = _mono_gp_eval(data, new_state)
    chi_m = jnp.sum(r_m * r_m, -1) * data.mg_w
    erase_m = data.mg_valid & (
        ((chi_m > CHI2_MONO) & ~data.mg_close)
        | ((chi_m > 1.5 * CHI2_MONO) & data.mg_close)
        | (Xc_m[:, 2] <= 0)
    )
    r_sg, _, _, _, _ = _stereo_gp_eval(data, new_state)
    chi_sg = jnp.sum(r_sg * r_sg, -1) * data.sg_w
    erase_sg = data.sg_valid & (chi_sg > CHI2_STEREO)
    r_st, _, _, z_st = _stereo_eval(data, new_state)
    chi_st = jnp.sum(r_st * r_st, -1) * data.st_w
    erase_st = data.st_valid & jnp.where(
        data.st_is_stereo,
        chi_st > CHI2_STEREO,
        ((chi_st > CHI2_MONO) & ~data.st_close)
        | ((chi_st > 1.5 * CHI2_MONO) & data.st_close)
        | (z_st <= 0),
    )

    # divergence guard: keep original state on failure
    out_state = jax.tree.map(
        lambda a, b: jnp.where(ok, b, a), state, new_state
    )
    return LocalBAResult(
        state=out_state,
        ok=ok,
        err_initial=err_initial,
        err_final=err_final,
        erase_m=erase_m,
        erase_sg=erase_sg,
        erase_st=erase_st,
    )


def global_ba(data: LocalBAData, state: BAState, num_iterations: int = 10):
    """Full-map bundle adjustment (`Optimizer::GlobalBundleAdjustemnt` [sic]
    -> BundleAdjustment, Optimizer.cc:53-367): same edge types as LocalGPBA
    but over every keyframe with only the first fixed, the GP chain robustified
    with Huber delta=21.026 (set data.gp_huber=True), landmarks marginalized,
    lambda_0 = 1e-5 (Optimizer.cc:76). Typically invoked from loop closing
    (`RunGlobalBundleAdjustment`, LoopClosing.cc:1206-1221) with 10 iterations.

    Returns (state', LMStats). Unlike LocalGPBA there is no divergence guard:
    results are staged by the caller (mTbwGBA semantics live in the pipeline).
    """
    problem = make_ba_problem(
        data, data.mg_valid, data.sg_valid, data.st_valid, huber_on=True
    )
    return lm_optimize(problem, state, num_iterations, lambda_init=1e-5)


def make_structure_ids(pairs: "np.ndarray", cams: "np.ndarray | None", valid,
                       n_poses: int, n_ext: int):
    """Host-side: compact structure ids + per-structure column tables for
    LocalBAData.mg_sid/mg_sid_cols (and sg_*, with cams=None).

    Returns (sid (E,), sid_cols (S, 24 or 30)). Padded/invalid edges map to a
    zero-filled dump structure (their Jacobians are masked to zero anyway).
    """
    import numpy as _np

    pairs = _np.asarray(pairs, _np.int64)
    E = pairs.shape[0]
    valid = _np.asarray(valid, bool)
    width = 30 if cams is not None else 24
    if E == 0:
        return _np.zeros(0, _np.int32), _np.zeros((1, width), _np.int32)
    if cams is not None:
        key = (pairs[:, 0] * n_poses + pairs[:, 1]) * n_ext + _np.asarray(cams, _np.int64)
    else:
        key = pairs[:, 0] * n_poses + pairs[:, 1]
    key = _np.where(valid, key, -1)
    uniq, inv = _np.unique(key, return_inverse=True)
    has_dump = uniq[0] == -1
    if not has_dump:
        uniq = _np.concatenate([[-1], uniq])
        inv = inv + 1
    S = len(uniq)
    cols = _np.zeros((S, width), _np.int32)
    for s_i in range(1, S):
        k = uniq[s_i]
        if cams is not None:
            c = k % n_ext
            ij = k // n_ext
        else:
            ij = k
        i, j = ij // n_poses, ij % n_poses
        base = _np.concatenate([12 * i + _np.arange(12), 12 * j + _np.arange(12)])
        if cams is not None:
            base = _np.concatenate([base, 12 * n_poses + 6 * c + _np.arange(6)])
        cols[s_i] = base
    # dump structure (index 0) scatters zero blocks at cols 0..width-1
    return inv.astype(_np.int32), cols
