"""End-to-end test of the non-keyframe GPObs producer path.

Reference plumbing: MapPoint.h:46-62 (AddGPObservation records), consumed by
BundleAdjustment/LocalGPBA (Optimizer.cc:252-304, 1027-1098). The reference
ships the producer commented out (Tracking.cc:1376-1384); here it is a real
config flag and must work end to end: tracking records GPObs on tracked map
points for every non-keyframe frame, extraction turns them into active
mono-GP / stereo-GP edges anchored at the (KF, nextKF) pose pair, and local
BA consumes them (finite chi2 that includes their residuals).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from amcslam_tpu.pipeline.extraction import extract_local_ba
from amcslam_tpu.pipeline.system import System
from amcslam_tpu.pipeline.tracking import TrackingConfig, TrackState
from amcslam_tpu.solver.ba import make_ba_problem
from amcslam_tpu.utils.synthetic import make_sequence


def _run_system(produce: bool):
    frames, rig, Ts_gt, _ = make_sequence(n_frames=12, n_cams=3, n_lm=300, seed=3)
    sys_ = System(
        rig,
        TrackingConfig(
            max_frames_between_kf=4,  # leave non-keyframe frames in between
            ransac_min_match=15,
            kf_translation_th=0.45,   # ~3 frames of synthetic motion
            produce_gp_obs=produce,
        ),
        enable_loop_closing=False,
    )
    st = None
    for f in frames:
        st = sys_.track_multicamera(f)
    assert st == TrackState.OK
    return sys_


@pytest.mark.slow
def test_gp_obs_produced_and_consumed():
    sys_ = _run_system(produce=True)
    m = sys_.atlas.active

    # 1) producer: non-keyframe observations were recorded on map points
    n_gpobs = sum(len(mp.gp_observations) for mp in m.map_points.values())
    assert n_gpobs > 0, "produce_gp_obs=True recorded no GPObs"
    # anchored at existing keyframes, with per-camera timestamps + octaves
    for mp in m.map_points.values():
        for kf_id, obs in mp.gp_observations:
            assert kf_id in m.keyframes
            assert 0 <= obs.cam < sys_.rig.n_cams
            assert np.all(np.isfinite(obs.uv))

    # 2) extraction: the GPObs become additional active edges vs a run
    #    where the producer is off (same sequence, same keyframe decisions)
    sys_off = _run_system(produce=False)

    def counts(s):
        kf = s.tracker.last_kf
        data, state, handles = extract_local_ba(kf, s.atlas.active.map_points, s.rig)
        return data, state, (
            int(np.sum(np.asarray(data.mg_valid)))
            + int(np.sum(np.asarray(data.sg_valid))),
            int(np.sum(np.asarray(data.st_valid))),
        )

    data_on, state_on, (gp_edges_on, st_on) = counts(sys_)
    _, _, (gp_edges_off, st_off) = counts(sys_off)
    # The GPObs edges feed back into local BA (that is the point), so the
    # two maps drift apart slightly — keyframe (stereo) edge counts stay in
    # the same ballpark but are not bit-identical (multi-camera Fuse makes
    # different merge decisions on the perturbed geometry).
    assert abs(st_on - st_off) < 0.15 * max(st_on, st_off), (st_on, st_off)
    assert gp_edges_on > gp_edges_off, (
        "GPObs records did not become extra GP-interpolated edges "
        f"({gp_edges_on} vs {gp_edges_off})"
    )

    # 3) solver consumes them: chi2 is finite and strictly larger than with
    #    the GPObs edges masked out (they contribute residuals)
    problem = make_ba_problem(
        data_on, data_on.mg_valid, data_on.sg_valid, data_on.st_valid
    )
    chi_full = float(problem.chi2(state_on))
    assert np.isfinite(chi_full)

    # masking all mono-GP/stereo-GP edges removes their contribution
    problem_masked = make_ba_problem(
        data_on,
        jnp.zeros_like(data_on.mg_valid),
        jnp.zeros_like(data_on.sg_valid),
        data_on.st_valid,
    )
    chi_masked = float(problem_masked.chi2(state_on))
    assert chi_full > chi_masked, "GP edges contribute nothing to chi2"
