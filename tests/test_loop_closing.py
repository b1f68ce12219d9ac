"""Loop-closing pipeline test: drifted revisit -> Sim3 detection ->
correction + essential-graph optimization reduces the loop error."""

import numpy as np

from amcslam_tpu.pipeline.keyframe_database import KeyFrameDatabase
from amcslam_tpu.pipeline.loop_closing import LoopClosing
from amcslam_tpu.pipeline.map_store import KeyFrame, Map, MapPoint
from amcslam_tpu.pipeline.rig import Rig
from amcslam_tpu.utils.synthetic import make_rig, _np_exp_se3


def build_loop_map(n_kf=14, n_lm=120, drift=0.04, seed=0, n_local=25,
                   noise_px=0.3):
    """Closed circular trajectory with accumulating odometry drift. Every
    consecutive KF pair co-observes a local stereo landmark cluster (the map
    is locally well-constrained, as the real pipeline produces); the last KF
    revisits the first KF's area and re-observes its landmarks as drifted
    DUPLICATE points (what tracking would triangulate), which loop closing
    must detect, align, fuse, and globally optimize away. Observations are
    ground-truth consistent, so GT is the chi2 optimum (KF0 gauge-fixes)."""
    rng = np.random.RandomState(seed)
    Tbc, K, bf = make_rig(2, seed + 1)
    rig = Rig(Tbc=Tbc, K=K, bf=bf)
    m = Map()
    cam = rig.n_cams - 1

    step = np.array([1.2, 0, 0, 0, 0, 2 * np.pi / n_kf])
    gt = [np.eye(4)]
    for _ in range(n_kf - 1):
        gt.append(gt[-1] @ _np_exp_se3(step))
    est = [np.eye(4)]
    for k in range(n_kf - 1):
        noise = np.concatenate([rng.randn(3) * drift, rng.randn(3) * drift * 0.2])
        est.append(est[-1] @ _np_exp_se3(step + noise))

    # start-area landmarks (seen by first and last KF)
    X0 = rng.randn(n_lm, 3) * 2 + np.array([4.0, 0, 1.0])
    # per-step local clusters in front of the stereo camera at GT pose k,
    # co-observed by KFs k and k+1
    Xloc = []
    for k in range(n_kf - 1):
        Xc = np.stack([rng.uniform(-4, 4, n_local), rng.uniform(-3, 3, n_local),
                       rng.uniform(5, 14, n_local)], 1)
        Twc = gt[k] @ Tbc[cam]
        Xloc.append(Xc @ Twc[:3, :3].T + Twc[:3, 3])
    n_total = n_lm + (n_kf - 1) * n_local
    descs = rng.randint(0, 256, (n_total, 32)).astype(np.uint8)

    def project(Twb_gt, Xw):
        Twc = Twb_gt @ Tbc[cam]
        Tcw = np.linalg.inv(Twc)
        Xc = Xw @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = np.maximum(Xc[:, 2], 1e-9)
        u = K[cam, 0] * Xc[:, 0] / z + K[cam, 2]
        v = K[cam, 1] * Xc[:, 1] / z + K[cam, 3]
        return np.stack([u, v], 1), u - bf / z, Xc[:, 2] > 0.5

    mp_of = {}  # global landmark id -> MapPoint
    kfs = []
    prev = None
    for k in range(n_kf):
        obs = []  # (global landmark id, Xw_gt, anchor step)
        if k == 0 or k == n_kf - 1:
            obs += [(l, X0[l], 0) for l in range(n_lm)]
        for ck in (k - 1, k):
            if 0 <= ck < n_kf - 1:
                obs += [(n_lm + ck * n_local + i, Xloc[ck][i], ck)
                        for i in range(n_local)]
        ids = np.array([o[0] for o in obs], int)
        Xw = np.stack([o[1] for o in obs]) if obs else np.zeros((0, 3))
        anchors = np.array([o[2] for o in obs], int)
        kp, ur, vis = project(gt[k], Xw)
        ids, Xw, anchors = ids[vis], Xw[vis], anchors[vis]
        kp, ur = kp[vis], ur[vis]
        kp = kp + rng.randn(*kp.shape) * noise_px
        ur = ur + rng.randn(*ur.shape) * noise_px

        kf = KeyFrame(
            timestamp=float(k),
            cam_times=np.array([k - 0.02, float(k)]),
            Twb=est[k].copy(),
            velocity=np.zeros(6),
            keypoints=[np.zeros((0, 2)), kp],
            kp_octaves=[np.zeros(0, np.int64), np.zeros(len(kp), np.int64)],
            descriptors=[np.zeros((0, 32), np.uint8), descs[ids]],
            kp_ur=ur,
        )
        kf.prev_kf = prev
        if prev is not None:
            prev.next_kf = kf
        m.add_keyframe(kf)
        kfs.append(kf)
        prev = kf

        for i, l in enumerate(ids):
            g = kf.global_index(1, i)
            if k == n_kf - 1 and l < n_lm:
                # revisit: tracking would triangulate a drifted DUPLICATE
                dT = est[k] @ np.linalg.inv(gt[k])
                mp = MapPoint(position=dT[:3, :3] @ Xw[i] + dT[:3, 3],
                              descriptor=descs[l], first_kf_id=kf.id)
                m.add_map_point(mp)
                mp.add_observation(kf, 1, g)
                kf.matches[g] = mp.id
            elif l in mp_of:
                mp = mp_of[l]
                mp.add_observation(kf, 1, g)
                kf.matches[g] = mp.id
            else:
                a = anchors[i]
                dT = est[a] @ np.linalg.inv(gt[a])
                mp = MapPoint(position=dT[:3, :3] @ Xw[i] + dT[:3, 3],
                              descriptor=descs[l], first_kf_id=kf.id)
                mp_of[l] = mp
                m.add_map_point(mp)
                mp.add_observation(kf, 1, g)
                kf.matches[g] = mp.id
    for kf in kfs:
        kf.update_connections(m.map_points)
    return m, rig, kfs, gt


def test_loop_detection_and_correction():
    m, rig, kfs, gt = build_loop_map()
    db = KeyFrameDatabase()
    lc = LoopClosing(rig, m, db, fix_scale=True, min_matches=15,
                     consistency_needed=1)
    for k in kfs[:-1]:
        db.add(k)

    last = kfs[-1]
    err_before = np.linalg.norm(last.Twb[:3, 3] - gt[-1][:3, 3])

    hit = lc.detect_common_regions(last)
    assert hit is not None, "loop not detected"
    loop_kf, S12 = hit
    assert loop_kf.id == kfs[0].id

    lc.correct_loop(last, loop_kf, S12)
    err_after = np.linalg.norm(last.Twb[:3, 3] - gt[-1][:3, 3])
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # intermediate keyframes moved (drift redistributed) and stayed finite
    mid = kfs[len(kfs) // 2]
    assert np.isfinite(mid.Twb).all()
    assert lc.loops_closed == 1


def _run_closure(run_gba: bool, seed=0):
    m, rig, kfs, gt = build_loop_map(seed=seed)
    db = KeyFrameDatabase()
    lc = LoopClosing(rig, m, db, fix_scale=True, min_matches=15,
                     consistency_needed=1, run_global_ba=run_gba)
    for k in kfs[:-1]:
        db.add(k)
    hit = lc.detect_common_regions(kfs[-1])
    assert hit is not None
    lc.correct_loop(kfs[-1], hit[0], hit[1])
    ate = float(np.mean([
        np.linalg.norm(k.Twb[:3, 3] - g[:3, 3]) for k, g in zip(kfs, gt)
    ]))
    return m, kfs, ate


def test_global_ba_and_fuse_improve_over_essential_graph():
    """CorrectLoop must run SearchAndFuse + full GBA after the essential
    graph (LoopClosing.cc:1053, 1206-1339): duplicated revisit landmarks get
    merged into the loop-side points, and the metric ATE over the whole
    trajectory improves beyond the pose-graph-only correction."""
    m_ess, kfs_ess, ate_ess = _run_closure(run_gba=False)
    m_gba, kfs_gba, ate_gba = _run_closure(run_gba=True)

    # fuse merged the revisit duplicates: the last KF now observes map
    # points that are ALSO observed by the first KF
    first, last = kfs_gba[0], kfs_gba[-1]
    shared = 0
    for mp_id in last.matches:
        if mp_id >= 0 and int(mp_id) in m_gba.map_points:
            mp = m_gba.map_points[int(mp_id)]
            if first.id in mp.observations:
                shared += 1
    assert shared >= 15, f"SearchAndFuse merged only {shared} duplicates"

    assert np.isfinite(ate_gba)
    assert ate_gba < ate_ess, (ate_ess, ate_gba)


def _run_incremental(seed=7, close_loops=True, n_per=14, n_lm=100, n_local=20,
                     drift=0.05, noise_px=0.3):
    """Incremental two-revolution run: odometry drifts, loop closing (when
    enabled) corrects online at each revisit (KFs n_per-1 and 2*n_per-1).
    Landmarks anchor in the CURRENT (possibly corrected) estimate, as a real
    SLAM front-end would. Returns (kfs, gt, map, lc)."""
    rng = np.random.RandomState(seed)
    Tbc, K, bf = make_rig(2, seed + 1)
    rig = Rig(Tbc=Tbc, K=K, bf=bf)
    m = Map()
    db = KeyFrameDatabase()
    lc = LoopClosing(rig, m, db, fix_scale=True, min_matches=15,
                     consistency_needed=1,
                     run_global_ba=close_loops)
    if not close_loops:
        lc.min_matches = 10**9  # detection can never succeed
    cam = rig.n_cams - 1
    n_kf = 2 * n_per
    step = np.array([1.2, 0, 0, 0, 0, 2 * np.pi / n_per])

    gt = [np.eye(4)]
    for _ in range(n_kf - 1):
        gt.append(gt[-1] @ _np_exp_se3(step))
    X0 = rng.randn(n_lm, 3) * 2 + np.array([4.0, 0, 1.0])
    descs = rng.randint(0, 256, (n_lm + n_kf * n_local, 32)).astype(np.uint8)

    def project(Twb_gt, Xw):
        Tcw = np.linalg.inv(Twb_gt @ Tbc[cam])
        Xc = Xw @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = np.maximum(Xc[:, 2], 1e-9)
        u = K[cam, 0] * Xc[:, 0] / z + K[cam, 2]
        v = K[cam, 1] * Xc[:, 1] / z + K[cam, 3]
        return np.stack([u, v], 1), u - bf / z, Xc[:, 2] > 0.5

    mp_of = {}
    Xloc_gt = {}
    kfs = []
    prev = None
    est_prev = np.eye(4)
    for k in range(n_kf):
        est_k = (
            np.eye(4) if k == 0 else
            kfs[-1].Twb @ _np_exp_se3(
                step + np.concatenate([rng.randn(3) * drift,
                                       rng.randn(3) * drift * 0.2]))
        )
        revisit = k in (n_per - 1, 2 * n_per - 1)
        obs = []
        if k == 0 or revisit:
            obs += [(l, X0[l], None) for l in range(n_lm)]
        if k > 0 and (k - 1) in Xloc_gt:
            obs += [(n_lm + (k - 1) * n_local + i, Xloc_gt[k - 1][i], k - 1)
                    for i in range(n_local)]
        # new local cluster anchored at this KF
        Xc = np.stack([rng.uniform(-4, 4, n_local), rng.uniform(-3, 3, n_local),
                       rng.uniform(5, 14, n_local)], 1)
        Twc_gt = gt[k] @ Tbc[cam]
        Xloc_gt[k] = Xc @ Twc_gt[:3, :3].T + Twc_gt[:3, 3]
        obs += [(n_lm + k * n_local + i, Xloc_gt[k][i], k) for i in range(n_local)]

        ids = np.array([o[0] for o in obs], int)
        Xw = np.stack([o[1] for o in obs])
        anch = [o[2] for o in obs]
        kp, ur, vis = project(gt[k], Xw)
        sel = np.where(vis)[0]
        kp = kp[sel] + rng.randn(len(sel), 2) * noise_px
        ur = ur[sel] + rng.randn(len(sel)) * noise_px

        kf = KeyFrame(
            timestamp=float(k),
            cam_times=np.array([k - 0.02, float(k)]),
            Twb=est_k.copy(),
            velocity=np.zeros(6),
            keypoints=[np.zeros((0, 2)), kp],
            kp_octaves=[np.zeros(0, np.int64), np.zeros(len(sel), np.int64)],
            descriptors=[np.zeros((0, 32), np.uint8), descs[ids[sel]]],
            kp_ur=ur,
        )
        kf.prev_kf = prev
        if prev is not None:
            prev.next_kf = kf
        m.add_keyframe(kf)
        kfs.append(kf)
        prev = kf

        drift_T = est_k @ np.linalg.inv(gt[k])
        for i, si in enumerate(sel):
            l = int(ids[si])
            g = kf.global_index(1, i)
            if revisit and l < n_lm:
                mp = MapPoint(position=drift_T[:3, :3] @ Xw[si] + drift_T[:3, 3],
                              descriptor=descs[l], first_kf_id=kf.id)
                m.add_map_point(mp)
                mp.add_observation(kf, 1, g)
                kf.matches[g] = mp.id
            elif l in mp_of:
                mp_of[l].add_observation(kf, 1, g)
                kf.matches[g] = mp_of[l].id
            else:
                a = anch[si]
                aT = (kfs[a].Twb @ np.linalg.inv(gt[a])) if a is not None else drift_T
                mp = MapPoint(position=aT[:3, :3] @ Xw[si] + aT[:3, 3],
                              descriptor=descs[l], first_kf_id=kf.id)
                mp_of[l] = mp
                m.add_map_point(mp)
                mp.add_observation(kf, 1, g)
                kf.matches[g] = mp.id
        kf.update_connections(m.map_points)
        lc.insert_keyframe(kf)
        lc.run_once()

    ate = float(np.mean([np.linalg.norm(k_.Twb[:3, 3] - g[:3, 3])
                         for k_, g in zip(kfs, gt)]))
    return kfs, gt, m, lc, ate


def test_two_sequential_loops_stay_consistent():
    """Second closure must re-add the first loop's edge in the essential
    graph (Optimizer.cc:1540-1560) so the earlier correction is preserved;
    both closures together beat the open-loop drift."""
    kfs_o, gt_o, _, lc_o, ate_open = _run_incremental(close_loops=False)
    assert lc_o.loops_closed == 0
    kfs_c, gt_c, m_c, lc_c, ate_closed = _run_incremental(close_loops=True)
    assert lc_c.loops_closed == 2, lc_c.loops_closed
    # both loop edges recorded
    n_loop_edges = sum(len(k.loop_edges) for k in kfs_c)
    assert n_loop_edges >= 4  # two closures, both endpoints
    assert np.isfinite(ate_closed)
    assert ate_closed < 0.5 * ate_open, (ate_open, ate_closed)
    # the first revisit KF stays consistent after the second closure
    err13 = np.linalg.norm(kfs_c[13].Twb[:3, 3] - gt_c[13][:3, 3])
    assert err13 < 0.5, err13


def test_saved_trajectory_corrected_by_loop_closure():
    """Relative-frame-pose bookkeeping (Tracking.cc:1408-1427 +
    System.cc:393-460): frames stored as Trb against their reference
    keyframe must be retroactively corrected when loop closure moves the
    keyframes — the recomposed full-frame ATE improves after the closure."""
    from amcslam_tpu.pipeline.tracking import TrajectoryEntry

    m, rig, kfs, gt = build_loop_map()
    # per-frame records as Tracking produces them: pose relative to the
    # reference KF, captured at (drifted) track time
    entries = [
        TrajectoryEntry(k.timestamp, kfs[i - 1],
                        np.linalg.inv(kfs[i - 1].Twb) @ k.Twb, False)
        for i, k in enumerate(kfs) if i > 0
    ]

    def traj_ate(es):
        return float(np.mean([
            np.linalg.norm(e.Twb[:3, 3] - g[:3, 3])
            for e, g in zip(es, gt[1:])
        ]))

    ate_before = traj_ate(entries)
    db = KeyFrameDatabase()
    lc = LoopClosing(rig, m, db, fix_scale=True, min_matches=15,
                     consistency_needed=1)
    for k in kfs[:-1]:
        db.add(k)
    hit = lc.detect_common_regions(kfs[-1])
    assert hit is not None
    lc.correct_loop(kfs[-1], hit[0], hit[1])
    # the SAME records, recomposed lazily against the corrected KF poses
    ate_after = traj_ate(entries)
    assert ate_after < 0.6 * ate_before, (ate_before, ate_after)


def test_search_by_sim3_densification():
    """ORBmatcher::SearchBySim3 analogue: under the true Sim3 between two
    keyframes' body frames, point pairs that reproject onto each other's
    measured keypoints (and agree in descriptor) are matched; geometrically
    inconsistent pairs are rejected even with identical descriptors."""
    from amcslam_tpu.pipeline import matcher

    rng = np.random.RandomState(5)
    Tbc, K, bf = make_rig(2, 3)
    Tcb = np.stack([np.linalg.inv(T) for T in Tbc])
    cam = 1
    n = 40
    # body-frame points in front of the stereo camera of body frame 1
    Xc = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                   rng.uniform(4, 12, n)], 1)
    Xb1 = Xc @ Tbc[cam][:3, :3].T + Tbc[cam][:3, 3]
    # ground-truth Sim3 (scale 1, as multi-camera loops fix scale)
    R12 = _np_exp_se3(np.array([0, 0, 0, 0.1, -0.05, 0.3]))[:3, :3]
    t12 = np.array([0.4, -0.2, 0.1])
    Xb2 = (Xb1 - t12) @ R12  # inverse transform: Xb2 = R^T (Xb1 - t)

    def project(Xb):
        Xc_ = Xb @ Tcb[cam][:3, :3].T + Tcb[cam][:3, 3]
        u = K[cam, 0] * Xc_[:, 0] / Xc_[:, 2] + K[cam, 2]
        v = K[cam, 1] * Xc_[:, 1] / Xc_[:, 2] + K[cam, 3]
        return np.stack([u, v], 1)

    uv1 = project(Xb1)
    uv2 = project(Xb2)
    descs = rng.randint(0, 256, (n, 32)).astype(np.uint8)
    cams = np.full(n, cam, np.int32)

    perm = rng.permutation(n)
    idx = matcher.search_by_sim3(
        Xb1, cams, uv1, descs,
        Xb2[perm], cams, uv2[perm], descs[perm],
        1.0, R12, t12, Tcb, K,
    )
    inv = np.argsort(perm)
    assert (idx == inv).mean() > 0.9, (idx, inv)

    # wrong Sim3 -> geometric gate rejects nearly everything
    idx_bad = matcher.search_by_sim3(
        Xb1, cams, uv1, descs,
        Xb2[perm], cams, uv2[perm], descs[perm],
        1.0, np.eye(3), t12 + 5.0, Tcb, K,
    )
    assert (idx_bad >= 0).sum() <= n // 10
