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
):
    """A LocalGPBA-shaped problem instance (Optimizer.cc:713-1432 topology).

    n_kf keyframes on a smooth trajectory at 1 Hz keyframe rate; the first
    n_fixed are fixed anchors; landmarks observed by several consecutive KFs:
      - async cameras -> GP-interpolated mono obs tied to (KF_prev, KF) pairs
      - stereo camera -> stereo/mono obs at KF timestamps
      - optional non-KF GP stereo observations
    Returns (data: LocalBAData, state0: BAState perturbed, gt: BAState).
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

    # landmarks: sprinkled ahead of trajectory keyframes
    anchor = rng.randint(0, n_kf, n_lm)
    X = np.zeros((n_lm, 3))
    for l in range(n_lm):
        Twc = Ts[anchor[l]] @ Tbc[-1]
        Xc = np.array([rng.uniform(-4, 4), rng.uniform(-2.5, 2.5), rng.uniform(5, 25)])
        X[l] = Twc[:3, :3] @ Xc + Twc[:3, 3]

    def project(Twb, Tbc_c, K_c, Xw):
        Twc = Twb @ Tbc_c
        Xc = np.linalg.inv(Twc)[:3] @ np.append(Xw, 1.0)
        if Xc[2] <= 0.2:
            return None, Xc
        u = K_c[0] * Xc[0] / Xc[2] + K_c[2]
        v = K_c[1] * Xc[1] / Xc[2] + K_c[3]
        return np.array([u, v]), Xc

    def pose_at(t):
        k = min(int(np.floor(t / kf_dt)), n_kf - 2)
        s = t - times[k]
        return Ts[k] @ _np_exp_se3(vs[k] * s)

    mg, sg, st = [], [], []
    for l in range(n_lm):
        # stereo-cam KF observations around the anchor keyframe
        for k in range(max(0, anchor[l] - obs_per_lm // 2),
                       min(n_kf, anchor[l] + obs_per_lm // 2 + 1)):
            uv, Xc = project(Ts[k], Tbc[-1], K[-1], X[l])
            if uv is None:
                continue
            is_st = rng.rand() < 0.7
            ur = uv[0] - bf / Xc[2] + rng.randn() * noise_px if is_st else -1.0
            st.append((k, l, uv[0] + rng.randn() * noise_px,
                       uv[1] + rng.randn() * noise_px, ur, is_st))
        # async-camera GP observations on pairs (k-1, k)
        for _ in range(gpobs_per_lm):
            k = anchor[l]
            if k == 0:
                continue
            c = rng.randint(0, n_cams - 1)
            t = rng.uniform(times[k - 1] + 0.05, times[k] - 0.05)
            uv, Xc = project(pose_at(t), Tbc[c], K[c], X[l])
            if uv is None:
                continue
            mg.append((k - 1, k, l, c, t,
                       uv[0] + rng.randn() * noise_px, uv[1] + rng.randn() * noise_px))

    mg = np.array(mg) if mg else np.zeros((0, 7))
    st = np.array(st) if st else np.zeros((0, 6))
    Em, Es = len(mg), len(st)

    qi_inv_one = np.zeros((12, 12))
    qi_inv_one[:6, :6] = 12.0 / kf_dt**3 * np.eye(6)
    qi_inv_one[:6, 6:] = -6.0 / kf_dt**2 * np.eye(6)
    qi_inv_one[6:, :6] = -6.0 / kf_dt**2 * np.eye(6)
    qi_inv_one[6:, 6:] = 4.0 / kf_dt * np.eye(6)
    gp_pairs = np.stack([np.arange(n_kf - 1), np.arange(1, n_kf)], 1)

    Cx = n_cams - 1
    pose_fixed = np.arange(n_kf) < n_fixed

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
        sg_pair=jnp.zeros((0, 2), jnp.int32),
        sg_lm=jnp.zeros(0, jnp.int32),
        sg_t=jnp.zeros(0, dtype),
        sg_obs=jnp.zeros((0, 3), dtype),
        sg_w=jnp.ones(0, dtype),
        sg_valid=jnp.ones(0, bool),
        st_pose=jnp.asarray(st[:, 0], jnp.int32) if Es else jnp.zeros(0, jnp.int32),
        st_lm=jnp.asarray(st[:, 1], jnp.int32) if Es else jnp.zeros(0, jnp.int32),
        st_obs=jnp.asarray(st[:, 2:5], dtype) if Es else jnp.zeros((0, 3), dtype),
        st_w=jnp.ones(Es, dtype),
        st_valid=jnp.ones(Es, bool),
        st_is_stereo=jnp.asarray(st[:, 5] > 0.5) if Es else jnp.zeros(0, bool),
        st_close=jnp.zeros(Es, bool),
    )

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
