"""Map-store -> device-solver problem extraction (and write-back).

The SoA "graph builder": walks the host map exactly the way the reference's
Optimizer entry points walk theirs (temporal window via prev_kf, fixed
covisible anchors, per-observation edges by camera type) and emits the
padded, statically shaped LocalBAData / PoseGPData instances the jitted
solvers consume. Padding is bucketed to powers of two so window-size jitter
does not recompile the solver.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..solver.ba import BAState, LocalBAData
from ..solver.pose_solver import PoseGPData, PoseState
from .map_store import Frame, KeyFrame, Map
from .rig import Rig


# close-point chi2 relaxation threshold: trackDepth < 10 m
# (Optimizer.cc:442-524 bClose)
CLOSE_DEPTH_TH = 10.0


def _bucket(n: int, minimum: int = 16, factor: int = 2) -> int:
    from ..utils.shapes import bucket_pow2

    return bucket_pow2(n, minimum, factor)


# High-water padding for the local-BA problem: its six shape dimensions
# (window KFs, GP pairs, three edge types, landmarks) each fluctuate with
# map content, and every NEW combination compiles a fresh XLA program —
# independent pow2 buckets still produced tens of distinct combos over a
# run (profiled at ~38 s median per local BA on the remote-compile path,
# nearly all of it compilation). Monotone per-process maxima make the
# shape vector change only when some dimension outgrows its historical
# max: total compiles are bounded by the number of growth events
# (~log2 per dimension), concentrated at the start of a run. Padding
# cost is bounded because the local window itself is bounded.
_HIGH_WATER: dict[str, int] = {}


def _hw_bucket(key: str, n: int, minimum: int = 16, factor: int = 2) -> int:
    b = max(_bucket(n, minimum, factor), _HIGH_WATER.get(key, 0))
    _HIGH_WATER[key] = b
    return b


def reset_bucket_high_water():
    """Forget the per-process shape maxima (tests / bench isolation)."""
    _HIGH_WATER.clear()


#: serving-size bucket seeds for a full multi-camera run. Seeding the
#: high-water marks up front means the big solver programs (local BA, pose
#: solve) compile ONCE at their steady-state shapes instead of stepping
#: through warmup generations (each step = a fresh 30-60 s XLA:CPU trace+
#: compile — the dominant cost of a cold run; padded compute is cheap by
#: comparison). Values cover ~10-KF/50-anchor windows at 500-800 features
#: per camera; _hw_bucket still grows past them if a window is larger.
SERVING_BUCKETS = {
    "lba.K": 64, "lba.Em": 4096, "lba.Eg": 1024, "lba.Es": 16384,
    "lba.Ng": 64, "lba.Um": 256, "lba.Ug": 64, "lba.Sm": 256, "lba.Sg": 64,
    "lba.L": 4096, "lba.D": 128, "lba.De": 64,
    "pose.Nm": 1024, "pose.Ns": 1024,
}


def preset_shape_buckets(preset: "dict[str, int] | None" = None) -> None:
    """Seed the high-water shape buckets (default: SERVING_BUCKETS) so the
    jitted solver programs compile once at steady-state shapes."""
    for k, v in (preset or SERVING_BUCKETS).items():
        _HIGH_WATER[k] = max(_HIGH_WATER.get(k, 0), v)


def _pad(arr, n, fill=0):
    arr = np.asarray(arr)
    if arr.shape[0] >= n:
        return arr[:n]
    width = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, width, constant_values=fill)


def extract_local_ba(
    kf: KeyFrame,
    mp_table: dict,
    rig: Rig,
    max_opt: int = 10,
    max_fixed: int = 50,
    dtype=jnp.float32,
    kf_table: dict | None = None,
):
    """Build a LocalGPBA window around `kf` (Optimizer.cc:713-1036 walk).

    Returns (data: LocalBAData, state: BAState, handles) where handles maps
    solver array slots back to map entities for write-back. `kf_table`
    (Map.keyframes) makes fixed-anchor resolution O(1); without it the
    temporal chain is walked.

    The optimizable window is `Nd = min(#KF - 2, max_opt)` keyframes
    (Optimizer.cc:718-746): at least two keyframes always stay out of the
    window so the problem is gauge-anchored by a fixed prev-chain vertex —
    otherwise a young map (window == whole map, no covisible anchors)
    would be rank-deficient and free to slide as a whole.
    """
    # --- total keyframe count (for the Nd cap)
    if kf_table is not None:
        total = len(kf_table)
    else:
        total = 0
        k_ = kf
        while k_ is not None:
            total += 1
            k_ = k_.prev_kf
        k_ = kf.next_kf
        while k_ is not None:
            total += 1
            k_ = k_.next_kf
    nd = max(1, min(total - 2, max_opt))

    # --- temporal window via prev_kf chain
    window: list[KeyFrame] = [kf]
    while len(window) < nd and window[-1].prev_kf is not None:
        window.append(window[-1].prev_kf)
    window_ids = {k.id for k in window}

    # --- landmarks seen by the window
    lms: list = []
    lm_slot: dict[int, int] = {}
    for k in window:
        for mp_id in k.matches:
            if mp_id < 0 or int(mp_id) in lm_slot:
                continue
            mp = mp_table.get(int(mp_id))
            if mp is None or mp.bad:
                continue
            lm_slot[int(mp_id)] = len(lms)
            lms.append(mp)

    # --- fixed anchors: prev of the oldest window KF + covisible KFs
    fixed: list[KeyFrame] = []
    fixed_ids = set()
    tail_prev = window[-1].prev_kf
    if tail_prev is not None:
        fixed.append(tail_prev)
        fixed_ids.add(tail_prev.id)
    for mp in lms:
        for kf_id in mp.observations:
            if kf_id in window_ids or kf_id in fixed_ids:
                continue
            if kf_table is not None:
                other = kf_table.get(kf_id)
            else:
                other = _kf_by_id(window[0], kf_id)
            if other is not None and not other.bad:
                fixed.append(other)
                fixed_ids.add(kf_id)
            if len(fixed) >= max_fixed:
                break
        if len(fixed) >= max_fixed:
            break

    kfs = window + fixed  # index order: optimizable first
    n_opt = len(window)
    chain = list(reversed(window))
    if tail_prev is not None:
        chain = [tail_prev] + chain
    return _assemble_ba(kfs, n_opt, lms, lm_slot, chain, rig, dtype,
                        gp_huber=False)


def extract_global_ba(map_: Map, rig: Rig, dtype=jnp.float32):
    """Build the full-map BA problem (GlobalBundleAdjustemnt ->
    BundleAdjustment, Optimizer.cc:53-367): every keyframe, only the origin
    fixed, GP chain over the whole temporal sequence with Huber delta
    (Optimizer.cc:130), all landmarks marginalized."""
    kfs_t = sorted(map_.keyframes.values(), key=lambda k: k.timestamp)
    if len(kfs_t) < 2:
        raise ValueError("global BA needs at least two keyframes")
    # optimizable-first slot order: origin (fixed) goes last
    kfs = kfs_t[1:] + [kfs_t[0]]
    n_opt = len(kfs) - 1
    lms, lm_slot = [], {}
    for k in kfs:
        for mp_id in k.matches:
            if mp_id < 0 or int(mp_id) in lm_slot:
                continue
            mp = map_.map_points.get(int(mp_id))
            if mp is None or mp.bad:
                continue
            lm_slot[int(mp_id)] = len(lms)
            lms.append(mp)
    return _assemble_ba(kfs, n_opt, lms, lm_slot, kfs_t, rig, dtype,
                        gp_huber=True)


def _assemble_ba(kfs, n_opt, lms, lm_slot, chain, rig, dtype, gp_huber):
    """Shared SoA assembly: kfs (optimizable-first), GP chain (temporal KF
    list), landmarks -> padded LocalBAData/BAState/handles."""
    kf_slot = {k.id: i for i, k in enumerate(kfs)}
    kf_map = {k.id: k for k in kfs}
    K_real = len(kfs)
    # Bucket the pose count too (phantom poses: fixed, no velocity edge, no
    # GP chain, referenced by no edge) — otherwise every new window size
    # compiles a fresh local-BA program, and the window grows by one KF at a
    # time early in a run.
    K = _hw_bucket("lba.K", K_real, minimum=4)

    # --- pose-level arrays
    times = np.array([k.timestamp for k in kfs])
    if K > K_real:
        times = np.concatenate([times, times[-1] + 1.0 + np.arange(K - K_real)])
    pose_fixed = (np.arange(K) >= n_opt) | (np.arange(K) >= K_real)
    vel_valid = ~pose_fixed

    gp_pairs = []
    for a, b in zip(chain[:-1], chain[1:]):
        gp_pairs.append((kf_slot[a.id], kf_slot[b.id]))
    gp_pairs = np.array(gp_pairs, np.int64).reshape(-1, 2)
    gp_dts = times[gp_pairs[:, 1]] - times[gp_pairs[:, 0]]
    gp_qi_inv = np.stack([rig.qi_inv(dt) for dt in gp_dts]) if len(gp_dts) else np.zeros((0, 12, 12))

    # --- observation edges (+ aligned erase-target metadata: the reference
    # erases mono-GP KF obs / GPObs records / stereo-cam obs differently,
    # Optimizer.cc:1257-1382)
    mg, sg, st = [], [], []
    mg_close, st_close = [], []
    mg_meta, sg_meta, st_meta = [], [], []

    def _depth(k, cam, mp):
        Tcw = np.linalg.inv(k.Twb @ rig.Tbc[cam])
        return float((Tcw[:3, :3] @ mp.position + Tcw[:3, 3])[2])

    for k in kfs:
        s = kf_slot[k.id]
        for gidx, mp_id in enumerate(k.matches):
            if mp_id < 0 or int(mp_id) not in lm_slot:
                continue
            l = lm_slot[int(mp_id)]
            mp = lms[l]
            cam, local = k.cam_of_global(gidx)
            uv = k.keypoints[cam][local]
            w = k.kp_inv_sigma2(rig, cam, local)
            if cam == rig.n_cams - 1:
                ur = k.kp_ur[local] if k.kp_ur is not None else -1.0
                st.append((s, l, uv[0], uv[1], ur, w, ur >= 0))
                st_close.append(_depth(k, cam, mp) < CLOSE_DEPTH_TH)
                st_meta.append((k, mp, gidx))
            else:
                # async camera: GP edge on the (prev, this) pose pair
                if k.prev_kf is not None and k.prev_kf.id in kf_slot:
                    i = kf_slot[k.prev_kf.id]
                    t = k.cam_times[cam]
                    mg.append((i, s, l, cam, t, uv[0], uv[1], w))
                    mg_close.append(_depth(k, cam, mp) < CLOSE_DEPTH_TH)
                    mg_meta.append(("kf", k, cam, mp, gidx))
        # non-keyframe GPObs records attached to this KF's interval
        # (BundleAdjustment/LocalGPBA consume them against (KF, nextKF))
    for mp in lms:
        l = lm_slot[mp.id]
        for kf_id, obs in mp.gp_observations:
            if kf_id not in kf_slot:
                continue
            k = kf_map[kf_id]
            if k.next_kf is None or k.next_kf.id not in kf_slot:
                continue
            i, j = kf_slot[kf_id], kf_slot[k.next_kf.id]
            w = rig.inv_sigma2(obs.octave) / getattr(obs, "sigma2_scale", 1.0)
            if obs.cam == rig.n_cams - 1 and obs.ur >= 0:
                sg.append((i, j, l, obs.time, obs.uv[0], obs.uv[1], obs.ur, w))
                sg_meta.append(("gp", kf_id, obs, mp))
            else:
                mg.append((i, j, l, obs.cam, obs.time, obs.uv[0], obs.uv[1], w))
                mg_close.append(_depth(k, obs.cam, mp) < CLOSE_DEPTH_TH)
                mg_meta.append(("gp", kf_id, obs, mp))

    # edge/landmark dims grow x4: trace+compile of the local-BA program is
    # shape-independent and dominates (30-60 s a shot), so fewer, coarser
    # shape steps beat tight padding (average 2x pad on linear-cost stages)
    Em = _hw_bucket("lba.Em", max(len(mg), 1), minimum=64, factor=4)
    Eg = _hw_bucket("lba.Eg", max(len(sg), 1), minimum=64, factor=4)
    Es = _hw_bucket("lba.Es", max(len(st), 1), minimum=64, factor=4)
    Ng = _hw_bucket("lba.Ng", max(len(gp_pairs), 1), minimum=4)
    mg_a = np.array(mg) if mg else np.zeros((0, 8))
    sg_a = np.array(sg) if sg else np.zeros((0, 8))
    st_a = np.array(st) if st else np.zeros((0, 7))

    Cx = rig.n_cams - 1
    from ..solver.ba import make_structure_ids

    mg_sid, mg_sid_cols = make_structure_ids(
        _pad(mg_a[:, :2], Em), _pad(mg_a[:, 3], Em) if mg_a.size else np.zeros(Em),
        _pad(np.ones(len(mg), bool), Em, False), K, Cx,
    )
    sg_sid, sg_sid_cols = make_structure_ids(
        _pad(sg_a[:, :2], Eg), None,
        _pad(np.ones(len(sg), bool), Eg, False), K, Cx,
    )
    # structure counts are data-dependent; pad to high-water so the unique
    # (pair, cam) combination count never retraces the solver
    Sm = _hw_bucket("lba.Sm", len(mg_sid_cols), minimum=8)
    Sg = _hw_bucket("lba.Sg", len(sg_sid_cols), minimum=8)
    mg_sid_cols = _pad(mg_sid_cols, Sm)
    sg_sid_cols = _pad(sg_sid_cols, Sg)
    # interp-combo tables: async cameras fire at fixed phases, so the window
    # has O(K*C) unique (pair, cam-timestamp) combos; the GP chain is
    # evaluated once per combo instead of once per edge. Combo counts are
    # high-water bucketed like every other per-window shape.
    from ..solver.ba import build_interp_tables

    mg_it, mg_it_sid, mg_it_t = build_interp_tables(
        mg_sid, _pad(mg_a[:, 4] if mg_a.size else np.zeros(0), Em),
        _pad(np.ones(len(mg), bool), Em, False),
    )
    sg_it, sg_it_sid, sg_it_t = build_interp_tables(
        sg_sid, _pad(sg_a[:, 3] if sg_a.size else np.zeros(0), Eg),
        _pad(np.ones(len(sg), bool), Eg, False),
    )
    Um = _hw_bucket("lba.Um", len(mg_it_sid), minimum=16)
    Ug = _hw_bucket("lba.Ug", len(sg_it_sid), minimum=16)
    mg_it_sid, mg_it_t = _pad(mg_it_sid, Um), _pad(mg_it_t, Um)
    sg_it_sid, sg_it_t = _pad(sg_it_sid, Ug), _pad(sg_it_t, Ug)
    data = LocalBAData(
        times=jnp.asarray(times, dtype),
        pose_fixed=jnp.asarray(pose_fixed),
        vel_valid=jnp.asarray(vel_valid),
        qcinv22=jnp.asarray(rig.qc_inv_diag[2], dtype),
        gp_pairs=jnp.asarray(_pad(gp_pairs, Ng), jnp.int32),
        gp_qi_inv=jnp.asarray(_pad(gp_qi_inv, Ng), dtype),
        gp_valid=jnp.asarray(_pad(np.ones(len(gp_pairs), bool), Ng, False)),
        gp_huber=jnp.asarray(gp_huber),
        Tbc_stereo=jnp.asarray(rig.Tbc[-1], dtype),
        K_stereo=jnp.asarray(rig.K[-1], dtype),
        bf=jnp.asarray(rig.bf, dtype),
        K_async=jnp.asarray(rig.K[:Cx], dtype),
        ext_fixed=jnp.ones(Cx, bool),
        R_prior=jnp.asarray(rig.Rbc_ini, dtype),
        ext_info=jnp.asarray(rig.ext_prior_info, dtype),
        mg_pair=jnp.asarray(_pad(mg_a[:, :2], Em), jnp.int32),
        mg_lm=jnp.asarray(_pad(mg_a[:, 2], Em), jnp.int32),
        mg_cam=jnp.asarray(_pad(mg_a[:, 3], Em), jnp.int32),
        mg_t=jnp.asarray(_pad(mg_a[:, 4], Em), dtype),
        mg_obs=jnp.asarray(_pad(mg_a[:, 5:7], Em), dtype),
        mg_w=jnp.asarray(_pad(mg_a[:, 7] if mg_a.size else np.zeros(0), Em), dtype),
        mg_valid=jnp.asarray(_pad(np.ones(len(mg), bool), Em, False)),
        mg_close=jnp.asarray(_pad(np.asarray(mg_close, bool), Em, False)),
        mg_sid=jnp.asarray(mg_sid),
        mg_sid_cols=jnp.asarray(mg_sid_cols),
        sg_pair=jnp.asarray(_pad(sg_a[:, :2], Eg), jnp.int32),
        sg_lm=jnp.asarray(_pad(sg_a[:, 2], Eg), jnp.int32),
        sg_t=jnp.asarray(_pad(sg_a[:, 3], Eg), dtype),
        sg_obs=jnp.asarray(_pad(sg_a[:, 4:7], Eg), dtype),
        sg_w=jnp.asarray(_pad(sg_a[:, 7] if sg_a.size else np.zeros(0), Eg), dtype),
        sg_valid=jnp.asarray(_pad(np.ones(len(sg), bool), Eg, False)),
        sg_sid=jnp.asarray(sg_sid),
        sg_sid_cols=jnp.asarray(sg_sid_cols),
        st_pose=jnp.asarray(_pad(st_a[:, 0], Es), jnp.int32),
        st_lm=jnp.asarray(_pad(st_a[:, 1], Es), jnp.int32),
        st_obs=jnp.asarray(_pad(st_a[:, 2:5], Es), dtype),
        st_w=jnp.asarray(_pad(st_a[:, 5] if st_a.size else np.zeros(0), Es), dtype),
        st_valid=jnp.asarray(_pad(np.ones(len(st), bool), Es, False)),
        st_is_stereo=jnp.asarray(_pad(st_a[:, 6] if st_a.size else np.zeros(0), Es).astype(bool)),
        st_close=jnp.asarray(_pad(np.asarray(st_close, bool), Es, False)),
        mg_it=jnp.asarray(mg_it),
        mg_it_sid=jnp.asarray(mg_it_sid),
        mg_it_t=jnp.asarray(mg_it_t, dtype),
        sg_it=jnp.asarray(sg_it),
        sg_it_sid=jnp.asarray(sg_it_sid),
        sg_it_t=jnp.asarray(sg_it_t, dtype),
    )

    L = _hw_bucket("lba.L", max(len(lms), 1), minimum=64, factor=4)
    from ..solver.ba import with_landmark_tables

    # per-landmark slot depths are data maxima; high-water them too
    data = with_landmark_tables(
        data, L,
        pad_d=_HIGH_WATER.get("lba.D", 0), pad_de=_HIGH_WATER.get("lba.De", 0),
    )
    _hw_bucket("lba.D", data.lm_blk.shape[1], minimum=4)
    _hw_bucket("lba.De", data.lm_edge.shape[1], minimum=4)
    X = _pad(np.stack([mp.position for mp in lms]) if lms else np.zeros((0, 3)), L)
    T_all = np.stack([k.Twb for k in kfs] + [np.eye(4)] * (K - K_real))
    v_all = np.stack([k.velocity for k in kfs] + [np.zeros(6)] * (K - K_real))
    state = BAState(
        T=jnp.asarray(T_all, dtype),
        v=jnp.asarray(v_all, dtype),
        Text=jnp.asarray(rig.Tbc[:Cx], dtype),
        X=jnp.asarray(X, dtype),
    )
    handles = {
        "kfs": kfs,
        "n_opt": n_opt,
        "lms": lms,
        "mg_refs": mg,
        "st_refs": st,
        "sg_refs": sg,
        "mg_meta": mg_meta,
        "st_meta": st_meta,
        "sg_meta": sg_meta,
    }
    return data, state, handles


def _kf_by_id(any_kf: KeyFrame, kf_id: int):
    """Resolve a keyframe id by walking the temporal chain both ways (the
    map object usually resolves this; chain walk keeps extraction decoupled)."""
    k = any_kf
    while k is not None:
        if k.id == kf_id:
            return k
        k = k.prev_kf
    k = any_kf
    while k is not None:
        if k.id == kf_id:
            return k
        k = k.next_kf
    return None


def apply_local_ba(result_state: BAState, handles, mp_table: dict):
    """Write optimized poses/velocities/landmarks back (Optimizer.cc:1385-1428)."""
    T, v, X = jax.device_get(
        (result_state.T, result_state.v, result_state.X)
    )
    for i in range(handles["n_opt"]):
        kf = handles["kfs"][i]
        kf.set_pose(T[i])
        kf.velocity = v[i]
    for l, mp in enumerate(handles["lms"]):
        mp.position = X[l]


def apply_global_ba(result_state: BAState, handles, map_: Map):
    """Staged global-BA write-back (RunGlobalBundleAdjustment,
    LoopClosing.cc:1221-1339 mTbwGBA semantics): optimized poses/landmarks
    apply after convergence; keyframes created while GBA ran (absent from
    the problem) are corrected through their prev-chain parent's delta, and
    landmarks outside the problem through their reference keyframe's delta.
    """
    T, v, X = jax.device_get(
        (result_state.T, result_state.v, result_state.X)
    )
    in_problem = {}
    delta = {}  # kf_id -> Twb_after @ inv(Twb_before)
    for i, kf in enumerate(handles["kfs"]):
        in_problem[kf.id] = i
        delta[kf.id] = T[i] @ np.linalg.inv(kf.Twb)  # identity for the origin
    for i, kf in enumerate(handles["kfs"]):
        if i < handles["n_opt"]:
            kf.set_pose(T[i])
            kf.velocity = v[i]
    # propagate to keyframes created during GBA via the temporal chain
    for kf in sorted(map_.keyframes.values(), key=lambda k: k.timestamp):
        if kf.id in in_problem:
            continue
        parent = kf.prev_kf
        d = delta.get(parent.id) if parent is not None else None
        if d is None:
            d = np.eye(4)
        delta[kf.id] = d
        kf.set_pose(d @ kf.Twb)
    lm_in = set()
    for l, mp in enumerate(handles["lms"]):
        mp.position = X[l]
        lm_in.add(mp.id)
    for mp in map_.map_points.values():
        if mp.id in lm_in or mp.bad:
            continue
        d = delta.get(mp.first_kf_id)
        if d is not None:
            mp.position = d[:3, :3] @ mp.position + d[:3, 3]
    map_.increase_change_index()


def extract_pose_problem(
    frame: Frame,
    prev_frame: Frame,
    mp_table: dict,
    rig: Rig,
    fix_prev: bool = True,
    dtype=jnp.float32,
):
    """Build the per-frame PoseGPData (Optimizer::PoseGPOptimizationFromeLastFrame
    walk, Optimizer.cc:418-546). Returns (data, state, handles)."""
    mg, st = [], []
    mg_idx, st_idx = [], []
    for gidx, mp_id in enumerate(frame.matches):
        if mp_id < 0:
            continue
        mp = mp_table.get(int(mp_id))
        if mp is None or mp.bad:
            continue
        cam, local = frame.cam_of_global(gidx)
        uv = frame.keypoints[cam][local]
        w = frame.kp_inv_sigma2(rig, cam, local)
        Tcw = np.linalg.inv(frame.Twb @ rig.Tbc[cam])
        close = (Tcw[:3, :3] @ mp.position + Tcw[:3, 3])[2] < CLOSE_DEPTH_TH
        if cam != rig.n_cams - 1:
            mg.append((*mp.position, frame.cam_times[cam], cam, uv[0], uv[1],
                       w, close))
            mg_idx.append(gidx)
        else:
            ur = frame.kp_ur[local] if frame.kp_ur is not None else -1.0
            st.append((*mp.position, uv[0], uv[1], ur, w, ur >= 0, close))
            st_idx.append(gidx)

    Nm = _hw_bucket("pose.Nm", max(len(mg), 1), minimum=64, factor=4)
    Ns = _hw_bucket("pose.Ns", max(len(st), 1), minimum=64, factor=4)
    mg_a = np.array(mg) if mg else np.zeros((0, 9))
    st_a = np.array(st) if st else np.zeros((0, 9))

    dt = frame.timestamp - prev_frame.timestamp
    data = PoseGPData(
        t_prev=jnp.asarray(prev_frame.timestamp, dtype),
        t_cur=jnp.asarray(frame.timestamp, dtype),
        qi_inv=jnp.asarray(rig.qi_inv(dt), dtype),
        qcinv22=jnp.asarray(rig.qc_inv_diag[2], dtype),
        fix_prev=jnp.asarray(fix_prev),
        Tbc=jnp.asarray(rig.Tbc, dtype),
        K=jnp.asarray(rig.K, dtype),
        bf=jnp.asarray(rig.bf, dtype),
        mg_obs=jnp.asarray(_pad(mg_a[:, 5:7], Nm), dtype),
        mg_Xw=jnp.asarray(_pad(mg_a[:, 0:3], Nm), dtype),
        mg_t=jnp.asarray(_pad(mg_a[:, 3], Nm), dtype),
        mg_cam=jnp.asarray(_pad(mg_a[:, 4], Nm), jnp.int32),
        mg_w=jnp.asarray(_pad(mg_a[:, 7] if mg_a.size else np.zeros(0), Nm), dtype),
        mg_valid=jnp.asarray(_pad(np.ones(len(mg), bool), Nm, False)),
        mg_close=jnp.asarray(_pad(mg_a[:, 8] if mg_a.size else np.zeros(0), Nm).astype(bool)),
        st_obs=jnp.asarray(_pad(st_a[:, 3:6], Ns), dtype),
        st_Xw=jnp.asarray(_pad(st_a[:, 0:3], Ns), dtype),
        st_w=jnp.asarray(_pad(st_a[:, 6] if st_a.size else np.zeros(0), Ns), dtype),
        st_valid=jnp.asarray(_pad(np.ones(len(st), bool), Ns, False)),
        st_is_stereo=jnp.asarray(_pad(st_a[:, 7] if st_a.size else np.zeros(0), Ns).astype(bool)),
        st_close=jnp.asarray(_pad(st_a[:, 8] if st_a.size else np.zeros(0), Ns).astype(bool)),
        # every async camera fires once per frame: its features all share
        # cam_times[cam], so the interp table is just the camera-time array
        mg_it=jnp.asarray(_pad(mg_a[:, 4] if mg_a.size else np.zeros(0), Nm),
                          jnp.int32),
        it_t=jnp.asarray(np.asarray(frame.cam_times, np.float64), dtype),
    )
    state = PoseState(
        T=jnp.asarray(np.stack([prev_frame.Twb, frame.Twb]), dtype),
        v=jnp.asarray(np.stack([prev_frame.velocity, frame.velocity]), dtype),
    )
    handles = {"mg_idx": np.array(mg_idx, np.int64), "st_idx": np.array(st_idx, np.int64),
               "Nm": Nm, "Ns": Ns, "n_mg": len(mg), "n_st": len(st)}
    return data, state, handles
