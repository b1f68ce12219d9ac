"""Loop-closing pipeline test: drifted revisit -> Sim3 detection ->
correction + essential-graph optimization reduces the loop error."""

import numpy as np

from amcslam_tpu.pipeline.keyframe_database import KeyFrameDatabase
from amcslam_tpu.pipeline.loop_closing import LoopClosing
from amcslam_tpu.pipeline.map_store import KeyFrame, Map, MapPoint
from amcslam_tpu.pipeline.rig import Rig
from amcslam_tpu.utils.synthetic import make_rig, _np_exp_se3


def build_loop_map(n_kf=14, n_lm=120, drift=0.04, seed=0):
    """Closed square-ish trajectory; per-step odometry drift accumulates; the
    last KF revisits the first KF's place and sees the same landmarks."""
    rng = np.random.RandomState(seed)
    Tbc, K, bf = make_rig(2, seed + 1)
    rig = Rig(Tbc=Tbc, K=K, bf=bf)
    m = Map()

    # ground truth loop: n_kf steps around a circle back to start
    step = np.array([1.2, 0, 0, 0, 0, 2 * np.pi / n_kf])
    gt = [np.eye(4)]
    for _ in range(n_kf - 1):
        gt.append(gt[-1] @ _np_exp_se3(step))
    # drifted estimates
    est = [np.eye(4)]
    for k in range(n_kf - 1):
        noise = np.concatenate([rng.randn(3) * drift, rng.randn(3) * drift * 0.2])
        est.append(est[-1] @ _np_exp_se3(step + noise))

    # landmarks near the start, with unique descriptors
    X0 = rng.randn(n_lm, 3) * 2 + np.array([4.0, 0, 1.0])
    descs = rng.randint(0, 256, (n_lm, 32)).astype(np.uint8)

    cam = rig.n_cams - 1
    kfs = []
    prev = None
    for k in range(n_kf):
        sees_start = k == 0 or k == n_kf - 1
        if sees_start:
            # project start-area landmarks from the GROUND TRUTH pose (what
            # the sensor would see) but store the DRIFTED estimate
            Twc = gt[k] @ rig.Tbc[cam]
            Tcw = np.linalg.inv(Twc)
            kp, keep = [], []
            for l in range(n_lm):
                Xc = Tcw[:3, :3] @ X0[l] + Tcw[:3, 3]
                if Xc[2] < 0.5:
                    continue
                kp.append([
                    K[cam, 0] * Xc[0] / Xc[2] + K[cam, 2],
                    K[cam, 1] * Xc[1] / Xc[2] + K[cam, 3],
                ])
                keep.append(l)
            kp = np.array(kp).reshape(-1, 2)
            d = descs[keep]
        else:
            kp = np.zeros((0, 2))
            d = np.zeros((0, 32), np.uint8)
            keep = []
        kf = KeyFrame(
            timestamp=float(k),
            cam_times=np.array([k - 0.02, float(k)]),
            Twb=est[k].copy(),
            velocity=np.zeros(6),
            keypoints=[np.zeros((0, 2)), kp],
            kp_octaves=[np.zeros(0, np.int64), np.zeros(len(kp), np.int64)],
            descriptors=[np.zeros((0, 32), np.uint8), d],
        )
        kf.prev_kf = prev
        if prev is not None:
            prev.next_kf = kf
        m.add_keyframe(kf)
        kfs.append(kf)
        prev = kf

        if sees_start:
            for i, l in enumerate(keep):
                g = kf.global_index(1, i)
                if k == 0:
                    mp = MapPoint(position=X0[l], descriptor=descs[l], first_kf_id=kf.id)
                    mp.lm_index = l
                    m.add_map_point(mp)
                    mp.add_observation(kf, 1, g)
                    kf.matches[g] = mp.id
                    kfs[0]._lm2mp = getattr(kfs[0], "_lm2mp", {})
                    kfs[0]._lm2mp[l] = mp.id
                else:
                    # revisit: match to a NEW duplicate point in drifted coords
                    Twc_d = est[k] @ rig.Tbc[cam]
                    Tcw_gt = np.linalg.inv(gt[k] @ rig.Tbc[cam])
                    Xc = Tcw_gt[:3, :3] @ X0[l] + Tcw_gt[:3, 3]
                    Xw_d = Twc_d[:3, :3] @ Xc + Twc_d[:3, 3]
                    mp = MapPoint(position=Xw_d, descriptor=descs[l], first_kf_id=kf.id)
                    m.add_map_point(mp)
                    mp.add_observation(kf, 1, g)
                    kf.matches[g] = mp.id
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
