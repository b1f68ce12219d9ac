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
    cfg = TrackingConfig(max_frames_between_kf=3, ransac_min_match=15)
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
    est = np.stack([T for _, T in tracker.trajectory])
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
