"""Synthetic multi-camera SLAM problem generators for tests and benchmarks.

Generates the problem shapes of the reference pipeline: an asynchronous
multi-camera rig (N-1 async mono cameras + 1 stereo pair, orb_multicam.yaml
convention), smooth constant-twist-ish trajectories, landmarks, and
projected observations with configurable noise/outliers — assembled directly
into the solver's SoA structures.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops import lie
from ..solver.pose_solver import PoseGPData, PoseState


def _np_exp_se3(xi):
    from scipy.linalg import expm

    W = np.zeros((4, 4))
    W[:3, :3] = np.array(
        [[0, -xi[5], xi[4]], [xi[5], 0, -xi[3]], [-xi[4], xi[3], 0]]
    )
    W[:3, 3] = xi[:3]
    return expm(W)


def make_rig(n_cams=3, seed=0, dtype=np.float64):
    """Camera rig: n_cams-1 async monos + 1 stereo reference camera."""
    rng = np.random.RandomState(seed)
    Tbc = []
    for c in range(n_cams):
        xi = np.concatenate([rng.randn(3) * 0.3, rng.randn(3) * 0.2])
        if c == n_cams - 1:
            xi *= 0.1  # stereo camera near the body frame
        Tbc.append(_np_exp_se3(xi))
    K = np.tile(np.array([420.0, 420.0, 480.0, 300.0], dtype), (n_cams, 1))
    bf = 40.0
    return np.stack(Tbc).astype(dtype), K, bf


def make_pose_problem(
    n_mono=64,
    n_stereo=48,
    n_cams=3,
    noise_px=0.5,
    outlier_frac=0.0,
    seed=0,
    dtype=jnp.float64,
):
    """One per-frame pose-solve instance (PoseGPOptimizationFromeLastFrame).

    Returns (data: PoseGPData, state0: PoseState (perturbed), gt: PoseState).
    Observations are generated from the ground-truth continuous-time
    trajectory; async-camera timestamps fall strictly inside (t_prev, t_cur).
    """
    rng = np.random.RandomState(seed)
    np_dtype = np.dtype(dtype)
    Tbc, K, bf = make_rig(n_cams, seed + 1)

    t_prev, t_cur = 0.0, 0.1
    v_true = np.array([2.0, 0.2, -0.1, 0.02, -0.03, 0.2])
    T_prev = _np_exp_se3(rng.randn(6) * 0.2)
    T_cur = T_prev @ _np_exp_se3(v_true * (t_cur - t_prev))

    # --- async mono GP observations
    cams = rng.randint(0, n_cams - 1, n_mono)
    ts = rng.uniform(t_prev + 0.01, t_cur - 0.01, n_mono)
    mg_obs = np.zeros((n_mono, 2))
    mg_Xw = np.zeros((n_mono, 3))
    for i in range(n_mono):
        s = (ts[i] - t_prev) / (t_cur - t_prev)
        Twb = T_prev @ _np_exp_se3(v_true * s * (t_cur - t_prev))
        Twc = Twb @ Tbc[cams[i]]
        Xc = np.array([rng.uniform(-3, 3), rng.uniform(-2, 2), rng.uniform(4, 20)])
        Xw = Twc[:3, :3] @ Xc + Twc[:3, 3]
        u = K[cams[i], 0] * Xc[0] / Xc[2] + K[cams[i], 2]
        v = K[cams[i], 1] * Xc[1] / Xc[2] + K[cams[i], 3]
        mg_obs[i] = [u + rng.randn() * noise_px, v + rng.randn() * noise_px]
        mg_Xw[i] = Xw

    # --- stereo-camera observations at t_cur
    st_obs = np.zeros((n_stereo, 3))
    st_Xw = np.zeros((n_stereo, 3))
    is_stereo = rng.rand(n_stereo) < 0.7
    Twc = T_cur @ Tbc[-1]
    for i in range(n_stereo):
        Xc = np.array([rng.uniform(-3, 3), rng.uniform(-2, 2), rng.uniform(4, 20)])
        Xw = Twc[:3, :3] @ Xc + Twc[:3, 3]
        u = K[-1, 0] * Xc[0] / Xc[2] + K[-1, 2]
        v = K[-1, 1] * Xc[1] / Xc[2] + K[-1, 3]
        ur = u - bf / Xc[2]
        st_obs[i] = [
            u + rng.randn() * noise_px,
            v + rng.randn() * noise_px,
            (ur + rng.randn() * noise_px) if is_stereo[i] else -1.0,
        ]
        st_Xw[i] = Xw

    # --- outliers: corrupt a fraction of observations grossly
    n_out_m = int(outlier_frac * n_mono)
    if n_out_m:
        idx = rng.choice(n_mono, n_out_m, replace=False)
        mg_obs[idx] += rng.randn(n_out_m, 2) * 40 + 20
    n_out_s = int(outlier_frac * n_stereo)
    if n_out_s:
        idx = rng.choice(n_stereo, n_out_s, replace=False)
        st_obs[idx, :2] += rng.randn(n_out_s, 2) * 40 + 20

    qc_diag = np.ones(6)
    qi_inv = np.zeros((12, 12))
    dt = t_cur - t_prev
    qi_inv[:6, :6] = np.diag(12.0 / dt**3 / qc_diag)
    qi_inv[:6, 6:] = np.diag(-6.0 / dt**2 / qc_diag)
    qi_inv[6:, :6] = np.diag(-6.0 / dt**2 / qc_diag)
    qi_inv[6:, 6:] = np.diag(4.0 / dt / qc_diag)

    data = PoseGPData(
        t_prev=jnp.asarray(t_prev, dtype),
        t_cur=jnp.asarray(t_cur, dtype),
        qi_inv=jnp.asarray(qi_inv, dtype),
        qcinv22=jnp.asarray(1.0, dtype),
        fix_prev=jnp.asarray(True),
        Tbc=jnp.asarray(Tbc, dtype),
        K=jnp.asarray(K, dtype),
        bf=jnp.asarray(bf, dtype),
        mg_obs=jnp.asarray(mg_obs, dtype),
        mg_Xw=jnp.asarray(mg_Xw, dtype),
        mg_t=jnp.asarray(ts, dtype),
        mg_cam=jnp.asarray(cams, jnp.int32),
        mg_w=jnp.ones(n_mono, dtype),
        mg_valid=jnp.ones(n_mono, bool),
        mg_close=jnp.zeros(n_mono, bool),
        st_obs=jnp.asarray(st_obs, dtype),
        st_Xw=jnp.asarray(st_Xw, dtype),
        st_w=jnp.ones(n_stereo, dtype),
        st_valid=jnp.ones(n_stereo, bool),
        st_is_stereo=jnp.asarray(is_stereo),
        st_close=jnp.zeros(n_stereo, bool),
    )

    gt = PoseState(
        T=jnp.asarray(np.stack([T_prev, T_cur]), dtype),
        v=jnp.asarray(np.stack([v_true, v_true]), dtype),
    )
    # initial guess: previous state exact (fixed), current perturbed
    xi0 = rng.randn(6) * np.array([0.05, 0.05, 0.05, 0.01, 0.01, 0.01])
    T0 = np.stack([T_prev, T_cur @ _np_exp_se3(xi0)])
    v0 = np.stack([v_true, v_true + rng.randn(6) * 0.1])
    state0 = PoseState(T=jnp.asarray(T0, dtype), v=jnp.asarray(v0, dtype))
    return data, state0, gt


def make_local_ba_problem(
    n_kf=12,
    n_fixed=2,
    n_lm=256,
    n_cams=3,
    obs_per_lm=4,
    gpobs_per_lm=1,
    noise_px=0.5,
    seed=0,
    dtype=jnp.float64,
    shared_times=True,
    frames_per_interval=4,
):
    """A LocalGPBA-shaped problem instance (Optimizer.cc:713-1432 topology).

    n_kf keyframes on a smooth trajectory at 1 Hz keyframe rate; the first
    n_fixed are fixed anchors; landmarks observed by several consecutive KFs:
      - async cameras -> GP-interpolated mono obs tied to (KF_prev, KF) pairs
      - stereo camera -> stereo/mono obs at KF timestamps
      - optional non-KF GP stereo observations
    Returns (data: LocalBAData, state0: BAState perturbed, gt: BAState).

    shared_times=True models the real sensor rig: async cameras fire at
    fixed per-camera phases within each of `frames_per_interval` frame slots
    between consecutive KFs (System.cc:213-218, Frame.cc:200-207), so edges
    share interpolation timestamps and the interp-combo fast path applies.
    shared_times=False draws a distinct uniform-random time per observation
    (adversarial worst case: every edge its own GP chain).
    """
    from ..solver.ba import BAState, LocalBAData

    rng = np.random.RandomState(seed)
    Tbc, K, bf = make_rig(n_cams, seed + 1)
    kf_dt = 0.4
    times = np.arange(n_kf) * kf_dt

    # smooth trajectory: slowly varying twist
    v_base = np.array([2.0, 0.15, -0.05, 0.01, -0.02, 0.15])
    Ts, vs = [], []
    T = _np_exp_se3(rng.randn(6) * 0.1)
    for k in range(n_kf):
        vk = v_base + 0.15 * np.sin(0.4 * k) * np.array([1, 0.5, 0.2, 0.1, 0.1, 0.3])
        Ts.append(T)
        vs.append(vk)
        T = T @ _np_exp_se3(vk * kf_dt)
    Ts = np.stack(Ts)
    vs = np.stack(vs)

    # landmarks: sprinkled ahead of trajectory keyframes (vectorized)
    anchor = rng.randint(0, n_kf, n_lm)
    Xc0 = np.stack(
        [
            rng.uniform(-4, 4, n_lm),
            rng.uniform(-2.5, 2.5, n_lm),
            rng.uniform(5, 25, n_lm),
        ],
        axis=1,
    )
    Twc_anchor = Ts[anchor] @ Tbc[-1]
    X = np.einsum("lij,lj->li", Twc_anchor[:, :3, :3], Xc0) + Twc_anchor[:, :3, 3]

    def rigid_inv(T):
        """Batched rigid inverse of (...,4,4)."""
        R = T[..., :3, :3]
        t = T[..., :3, 3]
        Ti = np.zeros_like(T)
        Ti[..., :3, :3] = np.swapaxes(R, -1, -2)
        Ti[..., :3, 3] = -np.einsum("...ji,...j->...i", R, t)
        Ti[..., 3, 3] = 1.0
        return Ti

    # ---- stereo-cam KF observations: window of KFs around each anchor
    w2 = obs_per_lm // 2
    offs = np.arange(-w2, w2 + 1)
    k_mat = anchor[:, None] + offs[None, :]            # (L,W)
    in_range = (k_mat >= 0) & (k_mat < n_kf)
    k_clip = np.clip(k_mat, 0, n_kf - 1)
    Tcw = rigid_inv(Ts[k_clip] @ Tbc[-1])              # (L,W,4,4)
    Xc = np.einsum("lwij,lj->lwi", Tcw[..., :3, :3], X) + Tcw[..., :3, 3]
    vis = in_range & (Xc[..., 2] > 0.2)
    u = K[-1, 0] * Xc[..., 0] / Xc[..., 2] + K[-1, 2]
    v = K[-1, 1] * Xc[..., 1] / Xc[..., 2] + K[-1, 3]
    is_st_mat = rng.rand(n_lm, offs.size) < 0.7
    ur = np.where(
        is_st_mat, u - bf / Xc[..., 2] + rng.randn(n_lm, offs.size) * noise_px, -1.0
    )
    lm_mat = np.broadcast_to(np.arange(n_lm)[:, None], k_mat.shape)
    sel = vis.ravel()
    st = np.stack(
        [
            k_clip.ravel()[sel],
            lm_mat.ravel()[sel],
            (u + rng.randn(n_lm, offs.size) * noise_px).ravel()[sel],
            (v + rng.randn(n_lm, offs.size) * noise_px).ravel()[sel],
            ur.ravel()[sel],
            is_st_mat.ravel()[sel].astype(float),
        ],
        axis=1,
    )

    # ---- async-camera GP observations on pairs (anchor-1, anchor)
    rep = np.repeat(np.arange(n_lm), gpobs_per_lm)
    kk = anchor[rep]
    okm = kk > 0
    rep, kk = rep[okm], kk[okm]
    M = rep.size
    cc = rng.randint(0, n_cams - 1, M)
    if shared_times:
        # fixed per-camera phase within one of F frame slots per interval
        F = frames_per_interval
        slot = rng.randint(0, F, M)
        phase = (cc + 1.0) / n_cams
        tt = times[kk - 1] + ((slot + phase) / F) * (times[kk] - times[kk - 1])
    else:
        tt = times[kk - 1] + 0.05 + rng.rand(M) * (times[kk] - times[kk - 1] - 0.1)
    # batched exp_se3 via Rodrigues for the intra-interval pose
    xi = vs[kk - 1] * (tt - times[kk - 1])[:, None]
    rho, om = xi[:, :3], xi[:, 3:]
    th2 = np.sum(om * om, axis=1)
    th = np.sqrt(np.maximum(th2, 1e-32))
    A_ = np.where(th2 > 1e-16, np.sin(th) / th, 1.0)
    B_ = np.where(th2 > 1e-16, (1 - np.cos(th)) / np.maximum(th2, 1e-32), 0.5)
    C_ = np.where(th2 > 1e-16, (th - np.sin(th)) / np.maximum(th2 * th, 1e-32), 1 / 6)
    zeros = np.zeros(M)
    Wx = np.stack(
        [
            np.stack([zeros, -om[:, 2], om[:, 1]], 1),
            np.stack([om[:, 2], zeros, -om[:, 0]], 1),
            np.stack([-om[:, 1], om[:, 0], zeros], 1),
        ],
        axis=1,
    )
    Wx2 = np.einsum("mij,mjk->mik", Wx, Wx)
    I3 = np.eye(3)[None]
    Rm = I3 + A_[:, None, None] * Wx + B_[:, None, None] * Wx2
    Jl = I3 + B_[:, None, None] * Wx + C_[:, None, None] * Wx2
    tm = np.einsum("mij,mj->mi", Jl, rho)
    Texp = np.zeros((M, 4, 4))
    Texp[:, :3, :3] = Rm
    Texp[:, :3, 3] = tm
    Texp[:, 3, 3] = 1.0
    Twb_t = np.einsum("mij,mjk->mik", Ts[kk - 1], Texp)
    Tcw_m = rigid_inv(np.einsum("mij,mjk->mik", Twb_t, Tbc[cc]))
    Xcm = np.einsum("mij,mj->mi", Tcw_m[:, :3, :3], X[rep]) + Tcw_m[:, :3, 3]
    vism = Xcm[:, 2] > 0.2
    um = K[cc, 0] * Xcm[:, 0] / Xcm[:, 2] + K[cc, 2] + rng.randn(M) * noise_px
    vm = K[cc, 1] * Xcm[:, 1] / Xcm[:, 2] + K[cc, 3] + rng.randn(M) * noise_px
    mg = np.stack(
        [kk - 1, kk, rep, cc, tt, um, vm], axis=1
    )[vism]

    if mg.size == 0:
        mg = np.zeros((0, 7))
    if st.size == 0:
        st = np.zeros((0, 6))
    Em, Es = len(mg), len(st)

    qi_inv_one = np.zeros((12, 12))
    qi_inv_one[:6, :6] = 12.0 / kf_dt**3 * np.eye(6)
    qi_inv_one[:6, 6:] = -6.0 / kf_dt**2 * np.eye(6)
    qi_inv_one[6:, :6] = -6.0 / kf_dt**2 * np.eye(6)
    qi_inv_one[6:, 6:] = 4.0 / kf_dt * np.eye(6)
    gp_pairs = np.stack([np.arange(n_kf - 1), np.arange(1, n_kf)], 1)

    Cx = n_cams - 1
    pose_fixed = np.arange(n_kf) < n_fixed

    from ..solver.ba import build_interp_tables, make_structure_ids

    mg_pairs_np = mg[:, :2].astype(np.int64) if Em else np.zeros((0, 2), np.int64)
    mg_cams_np = mg[:, 3].astype(np.int64) if Em else np.zeros(0, np.int64)
    mg_sid, mg_sid_cols = make_structure_ids(
        mg_pairs_np, mg_cams_np, np.ones(Em, bool), n_kf, Cx
    )
    sg_sid, sg_sid_cols = make_structure_ids(
        np.zeros((0, 2), np.int64), None, np.zeros(0, bool), n_kf, Cx
    )
    mg_t_np = mg[:, 4] if Em else np.zeros(0)
    mg_it, mg_it_sid, mg_it_t = build_interp_tables(
        mg_sid, mg_t_np, np.ones(Em, bool)
    )
    sg_it, sg_it_sid, sg_it_t = build_interp_tables(
        np.zeros(0, np.int32), np.zeros(0), np.zeros(0, bool)
    )
    data = LocalBAData(
        times=jnp.asarray(times, dtype),
        pose_fixed=jnp.asarray(pose_fixed),
        vel_valid=jnp.asarray(~pose_fixed),
        qcinv22=jnp.asarray(1.0, dtype),
        gp_pairs=jnp.asarray(gp_pairs, jnp.int32),
        gp_qi_inv=jnp.asarray(np.tile(qi_inv_one, (n_kf - 1, 1, 1)), dtype),
        gp_valid=jnp.ones(n_kf - 1, bool),
        gp_huber=jnp.asarray(False),
        Tbc_stereo=jnp.asarray(Tbc[-1], dtype),
        K_stereo=jnp.asarray(K[-1], dtype),
        bf=jnp.asarray(bf, dtype),
        K_async=jnp.asarray(K[:Cx], dtype),
        ext_fixed=jnp.ones(Cx, bool),
        R_prior=jnp.asarray(Tbc[:Cx, :3, :3], dtype),
        ext_info=jnp.asarray(np.tile(np.eye(3) * 1e4, (Cx, 1, 1)), dtype),
        mg_pair=jnp.asarray(mg[:, :2], jnp.int32) if Em else jnp.zeros((0, 2), jnp.int32),
        mg_lm=jnp.asarray(mg[:, 2], jnp.int32) if Em else jnp.zeros(0, jnp.int32),
        mg_cam=jnp.asarray(mg[:, 3], jnp.int32) if Em else jnp.zeros(0, jnp.int32),
        mg_t=jnp.asarray(mg[:, 4], dtype) if Em else jnp.zeros(0, dtype),
        mg_obs=jnp.asarray(mg[:, 5:7], dtype) if Em else jnp.zeros((0, 2), dtype),
        mg_w=jnp.ones(Em, dtype),
        mg_valid=jnp.ones(Em, bool),
        mg_close=jnp.zeros(Em, bool),
        mg_sid=jnp.asarray(mg_sid),
        mg_sid_cols=jnp.asarray(mg_sid_cols),
        sg_pair=jnp.zeros((0, 2), jnp.int32),
        sg_lm=jnp.zeros(0, jnp.int32),
        sg_t=jnp.zeros(0, dtype),
        sg_obs=jnp.zeros((0, 3), dtype),
        sg_w=jnp.ones(0, dtype),
        sg_valid=jnp.ones(0, bool),
        sg_sid=jnp.asarray(sg_sid),
        sg_sid_cols=jnp.asarray(sg_sid_cols),
        st_pose=jnp.asarray(st[:, 0], jnp.int32) if Es else jnp.zeros(0, jnp.int32),
        st_lm=jnp.asarray(st[:, 1], jnp.int32) if Es else jnp.zeros(0, jnp.int32),
        st_obs=jnp.asarray(st[:, 2:5], dtype) if Es else jnp.zeros((0, 3), dtype),
        st_w=jnp.ones(Es, dtype),
        st_valid=jnp.ones(Es, bool),
        st_is_stereo=jnp.asarray(st[:, 5] > 0.5) if Es else jnp.zeros(0, bool),
        st_close=jnp.zeros(Es, bool),
        mg_it=jnp.asarray(mg_it),
        mg_it_sid=jnp.asarray(mg_it_sid),
        mg_it_t=jnp.asarray(mg_it_t, dtype),
        sg_it=jnp.asarray(sg_it),
        sg_it_sid=jnp.asarray(sg_it_sid),
        sg_it_t=jnp.asarray(sg_it_t, dtype),
    )
    from ..solver.ba import with_landmark_tables

    data = with_landmark_tables(data, n_lm)

    gt = BAState(
        T=jnp.asarray(Ts, dtype),
        v=jnp.asarray(vs, dtype),
        Text=jnp.asarray(Tbc[:Cx], dtype),
        X=jnp.asarray(X, dtype),
    )
    # perturb non-fixed states
    Tp = Ts.copy()
    vp = vs.copy()
    Xp = X + rng.randn(n_lm, 3) * 0.03
    for k in range(n_fixed, n_kf):
        Tp[k] = Ts[k] @ _np_exp_se3(
            rng.randn(6) * np.array([0.03, 0.03, 0.03, 0.005, 0.005, 0.005])
        )
        vp[k] = vs[k] + rng.randn(6) * 0.05
    state0 = BAState(
        T=jnp.asarray(Tp, dtype),
        v=jnp.asarray(vp, dtype),
        Text=jnp.asarray(Tbc[:Cx], dtype),
        X=jnp.asarray(Xp, dtype),
    )
    return data, state0, gt


def make_sequence(
    n_frames=30,
    n_cams=3,
    n_lm=400,
    fps=10.0,
    noise_px=0.3,
    stereo_depth_frac=0.8,
    seed=0,
):
    """Synthetic multi-camera sequence for end-to-end pipeline tests.

    Produces per-frame Frames (pipeline.map_store.Frame) with keypoints =
    projections of persistent landmarks (so descriptor matching is exact by
    construction: each landmark has a unique random 256-bit descriptor),
    stereo depths on the reference camera, and async camera timestamps.
    Returns (frames, rig, gt_poses (N,4,4), landmarks).
    """
    from ..pipeline.map_store import Frame
    from ..pipeline.rig import Rig

    rng = np.random.RandomState(seed)
    Tbc, K, bf = make_rig(n_cams, seed + 1)
    rig = Rig(Tbc=Tbc, K=K, bf=bf)

    dt = 1.0 / fps
    v_true = np.array([1.5, 0.1, 0.0, 0.0, 0.0, 0.12])
    Ts = [np.eye(4)]
    for k in range(1, n_frames):
        vk = v_true + 0.2 * np.sin(0.3 * k) * np.array([1, 0.3, 0, 0, 0, 0.5])
        Ts.append(Ts[-1] @ _np_exp_se3(vk * dt))
    Ts = np.stack(Ts)

    # landmarks sprinkled along the trajectory in front of the stereo camera
    anchor = rng.randint(0, n_frames, n_lm)
    X = np.zeros((n_lm, 3))
    for l in range(n_lm):
        Twc = Ts[anchor[l]] @ Tbc[-1]
        Xc = np.array([rng.uniform(-5, 5), rng.uniform(-3, 3), rng.uniform(4, 25)])
        X[l] = Twc[:3, :3] @ Xc + Twc[:3, 3]
    descs = rng.randint(0, 256, (n_lm, 32)).astype(np.uint8)

    def project_cam(Twb, c, Xw):
        Twc = Twb @ Tbc[c]
        Rcw = Twc[:3, :3].T
        Xc = Rcw @ (Xw - Twc[:3, 3])
        if Xc[2] < 0.5:
            return None, Xc
        u = K[c, 0] * Xc[0] / Xc[2] + K[c, 2]
        v = K[c, 1] * Xc[1] / Xc[2] + K[c, 3]
        if not (0 <= u < 960 and 0 <= v < 600):
            return None, Xc
        return np.array([u, v]), Xc

    frames = []
    for k in range(n_frames):
        t_frame = k * dt
        cam_times = rig.cam_times(t_frame)
        kps, octs, ds = [], [], []
        ur, depth = None, None
        for c in range(n_cams):
            # pose at this camera's timestamp (constant twist within frame)
            toff = cam_times[c] - t_frame
            if k > 0:
                vk = v_true + 0.2 * np.sin(0.3 * k) * np.array([1, 0.3, 0, 0, 0, 0.5])
            else:
                vk = v_true
            Twb_c = Ts[k] @ _np_exp_se3(vk * toff)
            kp_c, oc_c, d_c, ur_c, z_c = [], [], [], [], []
            for l in range(n_lm):
                uv, Xc = project_cam(Twb_c, c, X[l])
                if uv is None:
                    continue
                uv = uv + rng.randn(2) * noise_px
                kp_c.append(uv)
                oc_c.append(0)
                d_c.append(descs[l])
                if c == n_cams - 1:
                    has_d = rng.rand() < stereo_depth_frac
                    ur_c.append(uv[0] - bf / Xc[2] if has_d else -1.0)
                    z_c.append(Xc[2] if has_d else -1.0)
            kps.append(np.array(kp_c).reshape(-1, 2))
            octs.append(np.array(oc_c, np.int64))
            ds.append(np.array(d_c, np.uint8).reshape(-1, 32))
            if c == n_cams - 1:
                ur = np.array(ur_c)
                depth = np.array(z_c)
        frames.append(
            Frame(
                timestamp=t_frame,
                cam_times=cam_times,
                Twb=np.eye(4),
                velocity=np.zeros(6),
                keypoints=kps,
                kp_octaves=octs,
                descriptors=ds,
                kp_ur=ur,
                kp_depth=depth,
            )
        )
    return frames, rig, Ts, (X, descs)


def make_vi_ba_synthetic(
    n_kf=20,
    n_lm=500,
    steps_per_kf=40,
    imu_dt=0.005,
    noise_px=0.3,
    seed=0,
    dtype=jnp.float64,
):
    """A visual-inertial BA instance (config 4 of BASELINE.md): n_kf inertial
    keyframes on a smooth accelerating trajectory, IMU preintegration factors
    between consecutive KFs (ImuTypes.cc semantics via ops/imu.py), and mono
    reprojection edges to n_lm landmarks.

    Returns (data: VIBAData, state0: VIBAState perturbed, gt: VIBAState).
    """
    import jax

    from ..ops import imu
    from ..solver.vi_ba import VIBAData, VIBAState

    rng = np.random.RandomState(seed)
    G = np.array([0.0, 0.0, -9.81])
    w_body = np.array([0.25, -0.15, 0.4])
    a_world_fn = lambda t: np.array(
        [0.4 * np.sin(2 * t), 0.2 * np.cos(1.3 * t), 0.1 * np.cos(t)]
    )

    n_steps = steps_per_kf * (n_kf - 1)
    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([1.0, 0.0, 0.2])
    Rs, ps, vs, gyro, acc = [R.copy()], [p.copy()], [v.copy()], [], []
    for k in range(n_steps):
        t = k * imu_dt
        a_w = a_world_fn(t)
        gyro.append(w_body.copy())
        acc.append(R.T @ (a_w - G))
        p = p + v * imu_dt + 0.5 * a_w * imu_dt * imu_dt
        v = v + a_w * imu_dt
        R = R @ _np_exp_se3(np.r_[np.zeros(3), w_body * imu_dt])[:3, :3]
        Rs.append(R.copy()); ps.append(p.copy()); vs.append(v.copy())
    acc, gyro = np.array(acc), np.array(gyro)
    Rs, ps, vs = np.array(Rs), np.array(ps), np.array(vs)
    kf_idx = np.arange(n_kf) * steps_per_kf

    Nga = jnp.eye(6, dtype=dtype) * 1e-6
    walk = jnp.eye(6, dtype=dtype) * 1e-8
    dts = np.full(steps_per_kf, imu_dt)

    def pre_window(k):
        sl = slice(k * steps_per_kf, (k + 1) * steps_per_kf)
        return imu.preintegrate(
            jnp.asarray(acc[sl], dtype), jnp.asarray(gyro[sl], dtype),
            jnp.asarray(dts, dtype), jnp.zeros(3, dtype), jnp.zeros(3, dtype),
            Nga, walk,
        )

    pre_b = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[pre_window(k) for k in range(n_kf - 1)]
    )

    Tbc, Kin, _ = make_rig(2, seed + 1)
    cam = 0
    # landmarks sprinkled in front of the trajectory
    anchor = rng.randint(0, n_kf, n_lm)
    X = np.zeros((n_lm, 3))
    for l in range(n_lm):
        Twb = np.eye(4)
        Twb[:3, :3] = Rs[kf_idx[anchor[l]]]
        Twb[:3, 3] = ps[kf_idx[anchor[l]]]
        Twc = Twb @ Tbc[cam]
        Xc = np.array([rng.uniform(-4, 4), rng.uniform(-2.5, 2.5), rng.uniform(5, 20)])
        X[l] = Twc[:3, :3] @ Xc + Twc[:3, 3]

    obs, okf, olm, ocam = [], [], [], []
    for k in range(n_kf):
        Twb = np.eye(4)
        Twb[:3, :3] = Rs[kf_idx[k]]
        Twb[:3, 3] = ps[kf_idx[k]]
        Tcw = np.linalg.inv(Twb @ Tbc[cam])
        Xc = X @ Tcw[:3, :3].T + Tcw[:3, 3]
        vis = Xc[:, 2] > 1.0
        for l in np.nonzero(vis)[0]:
            u = Kin[cam, 0] * Xc[l, 0] / Xc[l, 2] + Kin[cam, 2]
            v_ = Kin[cam, 1] * Xc[l, 1] / Xc[l, 2] + Kin[cam, 3]
            obs.append([u + rng.randn() * noise_px, v_ + rng.randn() * noise_px])
            okf.append(k); olm.append(int(l)); ocam.append(cam)
    E = len(obs)

    data = VIBAData(
        pre=pre_b,
        imu_pairs=jnp.asarray(
            np.stack([np.arange(n_kf - 1), np.arange(1, n_kf)], 1), jnp.int32
        ),
        imu_valid=jnp.ones(n_kf - 1, bool),
        bg_lin=jnp.zeros((n_kf - 1, 3), dtype),
        ba_lin=jnp.zeros((n_kf - 1, 3), dtype),
        walk_info=jnp.eye(6, dtype=dtype) * 1e4,
        gravity=jnp.asarray(G, dtype),
        obs=jnp.asarray(np.array(obs), dtype),
        obs_kf=jnp.asarray(okf, jnp.int32),
        obs_lm=jnp.asarray(olm, jnp.int32),
        obs_cam=jnp.asarray(ocam, jnp.int32),
        w=jnp.ones(E, dtype),
        obs_valid=jnp.ones(E, bool),
        Tbc=jnp.asarray(Tbc, dtype),
        K_intr=jnp.asarray(Kin, dtype),
        pose_fixed=jnp.asarray(np.arange(n_kf) == 0),
    )
    gt = VIBAState(
        R=jnp.asarray(Rs[kf_idx], dtype),
        p=jnp.asarray(ps[kf_idx], dtype),
        v=jnp.asarray(vs[kf_idx], dtype),
        bg=jnp.zeros((n_kf, 3), dtype),
        ba=jnp.zeros((n_kf, 3), dtype),
        X=jnp.asarray(X, dtype),
    )
    Rp = np.asarray(gt.R).copy()
    for k in range(1, n_kf):
        Rp[k] = Rp[k] @ _np_exp_se3(np.r_[np.zeros(3), rng.randn(3) * 0.01])[:3, :3]
    free = (np.arange(n_kf) > 0)[:, None]
    state0 = VIBAState(
        R=jnp.asarray(Rp, dtype),
        p=gt.p + jnp.asarray(rng.randn(n_kf, 3) * 0.05 * free, dtype),
        v=gt.v + jnp.asarray(rng.randn(n_kf, 3) * 0.05 * free, dtype),
        bg=gt.bg,
        ba=gt.ba,
        X=gt.X + jnp.asarray(rng.randn(n_lm, 3) * 0.02, dtype),
    )
    return data, state0, gt


def make_essential_graph(n_kf=500, n_loop=40, drift=0.002, seed=0,
                         dtype=jnp.float64, step_m=0.1, laps=None):
    """A Sim3 pose-graph instance (config 5): n_kf keyframes on a loopy
    trajectory, consecutive-chain Sim3 edges measured from drifted odometry,
    plus n_loop drift-free loop-closure edges to early keyframes
    (Optimizer::OptimizeEssentialGraph topology, Optimizer.cc:1390-1680).

    `step_m` is the inter-keyframe spacing in meters (total path length
    ~= n_kf * step_m; the default matches the original 0.1 m graphs).

    With `laps=L`, the ground truth is L closed circuits of the same circle
    (radius chosen so each lap closes) and the loop edges are *revisit*
    closures: every (n_kf - n_kf//L)/n_loop-th keyframe on laps >= 2 gets a
    drift-free edge to the keyframe one lap earlier at the same spot — the
    topology a real detect-and-close run produces on a multi-lap route.

    Returns (data: EssentialGraphData, state0: Sim3Field drifted, gt poses).
    """
    from ..solver.sim3_opt import EssentialGraphData, Sim3Field

    rng = np.random.RandomState(seed)
    Ts = [np.eye(4)]
    if laps is None:
        # original open-arc trajectory (one tenth of a turn over the run)
        xi_step = np.array([step_m * 10.0, 0.0, 0.0,
                            0.0, 0.0, 2 * np.pi / n_kf]) * 0.1
    else:
        # closed circle per lap: rotation per step completes 2*pi each lap
        per_lap = n_kf // laps
        xi_step = np.array([step_m, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / per_lap])
    for k in range(1, n_kf):
        Ts.append(Ts[-1] @ _np_exp_se3(xi_step))
    Ts = np.stack(Ts)

    # drifted estimates: accumulate noisy relative motions
    Td = [Ts[0]]
    for k in range(1, n_kf):
        rel = np.linalg.inv(Ts[k - 1]) @ Ts[k]
        rel = rel @ _np_exp_se3(rng.randn(6) * drift)
        Td.append(Td[-1] @ rel)
    Td = np.stack(Td)

    pairs, ms, mR, mt = [], [], [], []
    # chain edges measured from the DRIFTED odometry (consistent with state0)
    for k in range(1, n_kf):
        rel = np.linalg.inv(Td[k]) @ Td[k - 1]
        pairs.append([k - 1, k]); ms.append(1.0)
        mR.append(rel[:3, :3]); mt.append(rel[:3, 3])
    if laps is None:
        # loop edges: drift-free ground-truth constraints to early keyframes
        for i in range(n_loop):
            a = int(rng.randint(0, n_kf // 4))
            b = int(rng.randint(3 * n_kf // 4, n_kf))
            rel = np.linalg.inv(Ts[b]) @ Ts[a]
            pairs.append([a, b]); ms.append(1.0)
            mR.append(rel[:3, :3]); mt.append(rel[:3, 3])
    else:
        # revisit closures: keyframe b on lap >= 2 against the keyframe one
        # lap earlier (same physical location on the circle)
        per_lap = n_kf // laps
        stride = max(1, (n_kf - per_lap) // max(n_loop, 1))
        for b in range(per_lap, n_kf, stride):
            a = b - per_lap
            rel = np.linalg.inv(Ts[b]) @ Ts[a]
            pairs.append([a, b]); ms.append(1.0)
            mR.append(rel[:3, :3]); mt.append(rel[:3, 3])

    E = len(pairs)
    data = EssentialGraphData(
        pairs=jnp.asarray(np.array(pairs), jnp.int32),
        meas_s=jnp.asarray(np.array(ms), dtype),
        meas_R=jnp.asarray(np.stack(mR), dtype),
        meas_t=jnp.asarray(np.stack(mt), dtype),
        valid=jnp.ones(E, bool),
        fixed=jnp.asarray(np.arange(n_kf) == 0),
        fix_scale=jnp.asarray(True),
    )
    Tdw = np.linalg.inv(Td)  # vertices store world->body (Scw convention)
    state0 = Sim3Field(
        s=jnp.ones(n_kf, dtype),
        R=jnp.asarray(Tdw[:, :3, :3], dtype),
        t=jnp.asarray(Tdw[:, :3, 3], dtype),
    )
    return data, state0, Ts
