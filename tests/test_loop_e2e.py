"""Loop closure from IMAGES, end to end (VERDICT r2 item 2): a rendered
closed-circle trajectory drives the full stack — native ORB on rendered
pixels, LSH keyframe-database detection, Sim3 RANSAC, OptimizeSim3,
CorrectLoop, essential graph — with no oracle keypoints or synthetic
descriptors anywhere. Reference contract: LoopClosing.cc:194-733/805-1206
driven from real extracted features, as multicam_amv.cc replays do.

The circle is sized to the smallest configuration that still revisits with
enough covisible structure to detect (one 12 s lap at 5 fps, radius 4 m,
~25 m travelled), so the test stays runnable inside the suite; the full run
(180 frames at 10 fps) lives in examples/e2e_rendered.py --circle and the
README records its numbers.
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
def test_rendered_circle_closes_loop():
    import e2e_rendered as e2e

    ate, dist, n_loops = e2e.run(
        n_frames=70, fps=5.0, seed=0, circle=True,
        circle_period=12.0, circle_radius=4.0, n_features=500,
    )
    # the revisit must be detected and closed from image-derived features
    assert n_loops >= 1, "no loop closure fired on the rendered revisit"
    # and the loop-consistent saved trajectory must beat 1% of the ~27 m lap
    assert np.isfinite(ate)
    assert ate < 0.01 * dist, (ate, dist)
