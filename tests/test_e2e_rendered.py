"""End-to-end on rendered images inside the test suite: the image -> ORB ->
matching -> tracking -> mapping path with no oracle keypoints anywhere
(examples/e2e_rendered.py at reduced scale)."""

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
def test_rendered_image_pipeline_tracks():
    import e2e_rendered as e2e

    ate, dist, _ = e2e.run(n_frames=8, fps=10.0, seed=0)
    # 8 frames (~0.7 m): tracking held and the error is sub-centimetre-ish;
    # the percentage bound is loose because the denominator is tiny.
    assert np.isfinite(ate)
    assert ate < 0.05, (ate, dist)
