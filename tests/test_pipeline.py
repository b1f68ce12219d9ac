"""End-to-end pipeline test: tracking + local mapping on a synthetic
multi-camera sequence, ATE against ground truth (the reference's de facto
integration test, SURVEY.md §4.1, in miniature)."""

import numpy as np
import pytest

from amcslam_tpu.pipeline.local_mapping import LocalMapping
from amcslam_tpu.pipeline.map_store import Atlas
from amcslam_tpu.pipeline.tracking import Tracking, TrackingConfig, TrackState
from amcslam_tpu.utils.synthetic import make_sequence


@pytest.mark.slow
def test_tracking_end_to_end():
    frames, rig, Ts_gt, (X, descs) = make_sequence(
        n_frames=12, n_cams=3, n_lm=300, noise_px=0.3, seed=0
    )
    atlas = Atlas()
    mapper = LocalMapping(rig, atlas.active)
    cfg = TrackingConfig(max_frames_between_kf=3, ransac_min_match=15,
                         kf_translation_th=0.25)
    tracker = Tracking(rig, atlas, cfg, local_mapper=mapper)

    states = []
    for f in frames:
        st = tracker.grab_frame(f)
        states.append(st)
        while mapper.run_once():
            pass

    # tracked throughout after initialization
    assert states[0] == TrackState.OK
    assert all(s == TrackState.OK for s in states[1:]), states

    # ATE: per-frame translation error vs ground truth
    est = np.stack([T for _, T in tracker.trajectory_poses()])
    ate = np.linalg.norm(est[:, :3, 3] - Ts_gt[: len(est), :3, 3], axis=1)
    traj_len = np.sum(
        np.linalg.norm(np.diff(Ts_gt[:, :3, 3], axis=0), axis=1)
    )
    rel = ate.max() / traj_len
    # Short 12-frame sequence: percentage ATE is inflated by the tiny
    # denominator; the absolute error is a few cm. (The 0.5%/10 km target is
    # benchmarked on long sequences, not here.)
    assert ate.max() < 0.06, (ate.max(), traj_len, rel)

    # map grew beyond the stereo seed
    assert atlas.active.n_map_points() > 100
    assert atlas.active.n_keyframes() >= 3


@pytest.mark.slow
def test_reference_kf_fallback_recovers_from_bad_motion_model():
    """TrackReferenceKeyFrame (Tracking.cc:1893): when the constant-twist
    prediction is corrupted for one frame, descriptor matching against the
    reference keyframe recovers tracking WITHOUT relocalization."""
    frames, rig, Ts_gt, _ = make_sequence(
        n_frames=10, n_cams=3, n_lm=300, noise_px=0.3, seed=4
    )
    atlas = Atlas()
    mapper = LocalMapping(rig, atlas.active)
    cfg = TrackingConfig(max_frames_between_kf=3, ransac_min_match=15,
                         kf_translation_th=0.25)
    tracker = Tracking(rig, atlas, cfg, local_mapper=mapper)
    for f in frames[:6]:
        assert tracker.grab_frame(f) == TrackState.OK
        while mapper.run_once():
            pass

    # corrupt the motion model: prediction lands far from the true pose
    tracker.velocity_model = tracker.velocity_model + np.array(
        [40.0, -35.0, 20.0, 0, 0, 1.5]
    )
    st = tracker.grab_frame(frames[6])
    assert st == TrackState.OK, st
    err = np.linalg.norm(frames[6].Twb[:3, 3] - Ts_gt[6][:3, 3])
    assert err < 0.5, err
    # and the run continues normally
    for f in frames[7:]:
        assert tracker.grab_frame(f) == TrackState.OK
        while mapper.run_once():
            pass


@pytest.mark.slow
def test_extrinsic_refinement_recovers_perturbed_tbc():
    """b_extrinsic=True (LocalGPBA phase 2, Optimizer.cc:1227-1240 +
    recovery :1419-1428), in the regime the feature serves: the map was
    built under the TRUE calibration, then the rig's extrinsic estimate
    drifts — subsequent local BAs must pull the static rig's Tbc back
    toward truth, and tracking keeps using the refined value.

    (When the map itself is built under the wrong extrinsic the problem is
    largely self-consistent — the reference behaves identically there; the
    from-scratch observability case is covered at solver level by
    tests/test_ba.py::test_extrinsic_phase2_recovers_perturbed_text.)"""
    from amcslam_tpu.ops.host_geom import exp_se3 as np_exp_se3

    frames, rig, Ts_gt, _ = make_sequence(
        n_frames=12, n_cams=3, n_lm=400, noise_px=0.3, seed=1
    )
    rig.ext_min_obs = 20
    Tbc_true = rig.Tbc.copy()

    atlas = Atlas()
    cfg = TrackingConfig(max_frames_between_kf=3, ransac_min_match=15,
                         kf_translation_th=0.25)
    # phase 1: build a clean map under the true calibration
    mapper = LocalMapping(rig, atlas.active, b_extrinsic=False)
    tracker = Tracking(rig, atlas, cfg, local_mapper=mapper)
    for f in frames[:7]:
        tracker.grab_frame(f)
        while mapper.run_once():
            pass

    # phase 2: the rig's extrinsic estimate drifts (keep it inside the
    # frustum search window, ~2-3 px; larger errors suppress the async
    # matches that carry the signal — the reference's 2.5/4 px radii
    # behave the same)
    pert = np_exp_se3(np.array([0.008, -0.006, 0.004, 0.004, -0.003, 0.005]))
    rig.Tbc[0] = rig.Tbc[0] @ pert
    Tbc_drifted = rig.Tbc[0].copy()
    mapper2 = LocalMapping(rig, atlas.active, b_extrinsic=True,
                           loop_closer=None)
    mapper2.recent_points = mapper.recent_points
    tracker.local_mapper = mapper2
    for f in frames[7:]:
        tracker.grab_frame(f)
        while mapper2.run_once():
            pass

    def ext_err(T):
        d = np.linalg.inv(Tbc_true[0]) @ T
        from scipy.spatial.transform import Rotation

        rot = np.linalg.norm(Rotation.from_matrix(d[:3, :3]).as_rotvec())
        return rot + np.linalg.norm(d[:3, 3])

    err0 = ext_err(Tbc_drifted)
    err1 = ext_err(rig.Tbc[0])
    # the rig was mutated (write-back happened) and moved toward truth
    assert not np.allclose(rig.Tbc[0], Tbc_drifted), "extrinsic never refined"
    assert err1 < 0.7 * err0, (err0, err1)


def test_async_camera_triangulation():
    """CreateNewMapPoints must triangulate through ASYNC cameras at their
    GP-interpolated poses (LocalMapping.cc:360-393) — landmarks get created
    from async-camera-only observations (no stereo keypoints at all)."""
    from amcslam_tpu.pipeline.map_store import KeyFrame, Map
    from amcslam_tpu.utils.synthetic import make_rig, _np_exp_se3

    rng = np.random.RandomState(9)
    Tbc, K, bf = make_rig(3, seed=2)
    from amcslam_tpu.pipeline.rig import Rig

    rig = Rig(Tbc=Tbc, K=K, bf=bf)
    m = Map()
    cam = 0  # async camera only
    v = np.array([1.5, 0, 0, 0, 0, 0.05])
    X = np.stack([rng.uniform(-4, 4, 40), rng.uniform(-3, 3, 40),
                  rng.uniform(6, 14, 40)], 1)
    descs = rng.randint(0, 256, (40, 32)).astype(np.uint8)

    kfs = []
    prev = None
    for k in range(2):
        t = float(k)
        Twb = _np_exp_se3(v * t) if k else np.eye(4)
        t_cam = t - 0.04
        # async camera pose at ITS OWN timestamp (the pipeline model)
        Twb_cam = Twb @ _np_exp_se3(v * (t_cam - t))
        Twc = Twb_cam @ Tbc[cam]
        # project world landmarks (placed in front of async cam 0 at k=0)
        Xw = (Tbc[cam][:3, :3] @ X.T).T + Tbc[cam][:3, 3]
        Tcw = np.linalg.inv(Twc)
        Xc = Xw @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = Xc[:, 2]
        keep = z > 0.5
        kp = np.stack([K[cam, 0] * Xc[:, 0] / z + K[cam, 2],
                       K[cam, 1] * Xc[:, 1] / z + K[cam, 3]], 1)[keep]
        ids = np.where(keep)[0]
        kf = KeyFrame(
            timestamp=t,
            cam_times=np.array([t_cam, t - 0.02, t]),
            Twb=Twb,
            velocity=v.copy(),
            keypoints=[kp, np.zeros((0, 2)), np.zeros((0, 2))],
            kp_octaves=[np.zeros(len(kp), np.int64), np.zeros(0, np.int64),
                        np.zeros(0, np.int64)],
            descriptors=[descs[ids], np.zeros((0, 32), np.uint8),
                         np.zeros((0, 32), np.uint8)],
        )
        kf.prev_kf = prev
        if prev is not None:
            prev.next_kf = kf
        m.add_keyframe(kf)
        kfs.append(kf)
        prev = kf

    mapper = LocalMapping(rig, m)
    created = mapper.create_new_map_points(kfs[1])
    assert created >= 10, created
    # created landmarks observed ONLY through the async camera, near truth
    Xw = (Tbc[cam][:3, :3] @ X.T).T + Tbc[cam][:3, 3]
    n_close = 0
    for mp in m.map_points.values():
        slots = mp.observations[kfs[1].id]
        assert slots[0] >= 0 and slots[1] < 0 and slots[2] < 0
        d = np.linalg.norm(Xw - mp.position, axis=1).min()
        if d < 0.05:
            n_close += 1
    assert n_close >= 0.8 * created, (n_close, created)
