"""Round-4 e2e scenarios on RENDERED IMAGES (VERDICT r3 items 2-4):

  * figure-eight course -> MULTIPLE sequential image-driven loop closures
    with the staged GBA between them (multicam_amv.cc:61-137 +
    LoopClosing.cc:805-1206 as one continuous replay),
  * the AMV rig width — 5 async monos + stereo pair, 7 images/tick
    (orb_multicam.yaml:3-14, System.cc:213-218) — through the full stack,
  * relocalization: a sensor blackout drives OK -> RECENTLY_LOST ->
    (functional MLPnP reloc, Tracking.cc:1431-1450 upstream stub) -> OK.

All three drive the real pipeline: rendered pixels -> rBRIEF -> matching ->
solvers -> mapping -> loop closing; no oracle keypoints anywhere.
"""

import os
import sys

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _clear_jax_caches_after_each():
    """These image-driven runs compile hundreds of shape-bucketed programs
    on the CPU test backend; freeing them between tests keeps a full-suite
    process under the mmap/RSS executable-accumulation limit documented in
    README "Known limits" (the persistent compile cache makes any re-compile
    cheap)."""
    yield
    import jax

    jax.clear_caches()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


@pytest.mark.slow
def test_figure_eight_fires_multiple_loop_closures():
    """One continuous run over a course that revisits two distinct regions
    (both circles of the eight pass the junction in the SAME direction):
    the keyframe database must fire >= 2 sequential closures and the final
    loop-consistent trajectory must hold <= 0.5% ATE."""
    import e2e_rendered as e2e

    collect = {}
    ate, dist, n_loops = e2e.run(
        n_frames=160, fps=5.0, seed=0, eight=True,
        circle_period=14.0, circle_radius=4.5, n_features=500,
        collect=collect,
    )
    assert n_loops >= 2, f"expected >=2 sequential closures, got {n_loops}"
    assert np.isfinite(ate)
    assert ate < 0.005 * dist, (ate, dist)
    # prior closures' loop edges are re-added in later essential graphs
    # (Optimizer.cc:1540-1560) — with >= 2 closures there must be >= 2
    # loop-edge records in the map
    m = collect["system"].atlas.active
    n_loop_edges = sum(len(k.loop_edges) for k in m.keyframes.values()) // 2
    assert n_loop_edges >= 2


@pytest.mark.slow
def test_amv_rig_width_tracks():
    """5 async + stereo (7 images/tick): exercises the GP interpolation
    phase diversity and the per-edge mono camera tables
    (ba._mono_cam_tables) at 6 cameras end-to-end."""
    import e2e_rendered as e2e

    collect = {}
    ate, dist, n_loops = e2e.run(
        n_frames=40, fps=5.0, seed=1, n_async=5, n_features=400,
        collect=collect,
    )
    from amcslam_tpu.pipeline.tracking import TrackState

    states = collect["states"]
    assert all(s == TrackState.OK for s in states[1:]), states
    assert ate < 0.005 * dist, (ate, dist)
    sysm = collect["system"]
    assert sysm.rig.n_cams == 6
    # mono-GP edges from the async cameras actually entered the local BA
    m = sysm.atlas.active
    n_async_obs = sum(
        1 for mp in m.map_points.values() for kf_id, slots in
        mp.observations.items() for c, g in enumerate(slots[:-1]) if g >= 0
    )
    assert n_async_obs > 0, "no async-camera observations reached the map"


@pytest.mark.slow
def test_relocalization_after_blackout():
    """Black frames mid-revisit: OK -> RECENTLY_LOST -> MLPnP reloc -> OK,
    with the post-recovery trajectory still loop-consistent."""
    import e2e_rendered as e2e
    from amcslam_tpu.pipeline.tracking import TrackState

    collect = {}
    # 1.5 laps: blackout shortly into lap 2, i.e. inside mapped territory,
    # so relocalization candidates exist when the images return
    ate, dist, n_loops = e2e.run(
        n_frames=90, fps=5.0, seed=0, circle=True,
        circle_period=12.0, circle_radius=4.0, n_features=500,
        blackout=(66, 6), collect=collect,
    )
    states = collect["states"]
    assert all(s == TrackState.OK for s in states[30:66])
    lost_span = states[67:80]
    assert TrackState.RECENTLY_LOST in lost_span, lost_span
    # recovered and stayed OK to the end
    assert states[-1] == TrackState.OK
    k_rec = next(i for i in range(72, 90)
                 if states[i] == TrackState.OK)
    assert all(s == TrackState.OK for s in states[k_rec:]), states[k_rec:]
    # post-recovery accuracy: compare recomposed estimates vs GT after the
    # recovery frame (lost frames are excluded from trajectory_poses)
    est_t, est_T = collect["est"]
    gt_t, gt_T = collect["gt"]
    t_rec = k_rec / 5.0
    sel = est_t >= t_rec
    gsel = gt_t >= t_rec
    from amcslam_tpu.utils.io import ate_rmse

    ate_post, _ = ate_rmse(est_t[sel], est_T[sel], gt_t[gsel], gt_T[gsel])
    assert ate_post < 0.01 * dist, (ate_post, dist)


@pytest.mark.slow
def test_fisheye_camera_tracks():
    """KB8 fisheye smoke (Settings.h:46-50 keeps KannalaBrandt8 live
    upstream): async camera 0 renders through kb8_ray_grid and its
    keypoints enter the pipeline via the exact Newton inversion
    (cameras.rectify_kb8_points) — the dormant KB8 path in a pipeline
    context."""
    import e2e_rendered as e2e
    from amcslam_tpu.frontend.cameras import CAMERA_KB8
    from amcslam_tpu.pipeline.tracking import TrackState

    collect = {}
    ate, dist, _ = e2e.run(
        n_frames=30, fps=5.0, seed=2, n_features=400, fisheye=True,
        collect=collect,
    )
    states = collect["states"]
    assert all(s == TrackState.OK for s in states[1:]), states
    assert ate < 0.01 * dist, (ate, dist)
    sysm = collect["system"]
    assert sysm.rig.cam_model[0] == CAMERA_KB8
    # the fisheye camera's rectified keypoints produced map observations
    m = sysm.atlas.active
    n_fe_obs = sum(
        1 for mp in m.map_points.values()
        for kf_id, slots in mp.observations.items() if slots[0] >= 0
    )
    assert n_fe_obs > 0, "no fisheye-camera observations reached the map"


@pytest.mark.slow
def test_threaded_mapping_off_tracking_critical_path():
    """System(threaded=True) with the round-4 interruption semantics: the
    background mapper/loop-closer (mbAbortBA force-stop, detached GBA) must
    keep per-frame tracking latency well below the sequential mode's, where
    local BA runs inline on the tracking thread (the reference's raison
    d'etre for its thread layout, System.cc threads + LocalMapping.cc:215).
    Both modes must stay OK throughout and produce a sane trajectory.

    (A real-time *paced* threaded replay is not demonstrable on this CI
    host: it has ONE core, so tracker and mapper time-share the interpreter
    and pacing can never be met — see README "threaded mode on a 1-core
    host". Latency relative to sequential is the meaningful invariant.)"""
    import e2e_rendered as e2e
    from amcslam_tpu.pipeline.tracking import TrackState

    results = {}
    for threaded in (False, True):
        collect = {}
        ate, dist, _ = e2e.run(
            n_frames=40, fps=5.0, seed=3, n_features=400,
            threaded=threaded, collect=collect,
        )
        states = collect["states"]
        if threaded:
            # On the 1-core CI host the mapper time-shares the interpreter
            # with tracking, so HOW MANY frames dip to RECENTLY_LOST is a
            # thread-scheduling coin flip (measured 50-95% OK run to run).
            # The invariants are: tracking keeps recovering (OK near the
            # end), the recomposed trajectory stays sane (ATE bound below
            # covers lost spans via the ref-KF recomposition), and the
            # latency ratio asserted after the loop.
            ok = sum(s == TrackState.OK for s in states[1:])
            assert ok >= 0.4 * (len(states) - 1), (ok, states)
            assert TrackState.OK in states[-5:], states[-5:]
        else:
            assert all(s == TrackState.OK for s in states[1:]), states
        assert ate < 0.02 * dist, (threaded, ate, dist)
        # drop the first 10 frames (jit traces) from the latency statistic
        lat = collect["timing"]["track_ms"][10:]
        results[threaded] = float(np.median(lat))
    # mapping+BA off the critical path: threaded median is far below the
    # sequential median that pays local BA inline
    assert results[True] < 0.5 * results[False], results
