"""From-scratch ORB extractor tests (frontend/orb.py vs the reference's
ORBextractor.cc contract): FAST segment test vs a brute-force oracle,
quadtree spatial-coverage statistics, budget compliance, descriptor
matching under rotation, and undistortion roundtrip (Frame.cc:697-737)."""

import numpy as np

from amcslam_tpu.frontend.orb import (
    OrbPipeline,
    brief_descriptors,
    distort_points,
    distribute_quadtree,
    fast_detect,
    gaussian_blur7,
    orientations,
    undistort_points,
)
from amcslam_tpu.pipeline import matcher


def _textured_image(h=480, w=640, n_blobs=400, seed=0):
    """Random soft blobs: plenty of corners everywhere."""
    rng = np.random.RandomState(seed)
    img = np.full((h, w), 120.0)
    ys = rng.randint(10, h - 10, n_blobs)
    xs = rng.randint(10, w - 10, n_blobs)
    for y, x in zip(ys, xs):
        sz = rng.randint(3, 9)
        img[y:y + sz, x:x + sz] = rng.randint(0, 255)
    return img.astype(np.uint8)


def _fast_oracle(img, x, y, t):
    """Brute-force FAST-9/16 segment test at one pixel."""
    circle = [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2),
              (1, 3), (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1),
              (-2, -2), (-1, -3)]
    c = int(img[y, x])
    vals = [int(img[y + dy, x + dx]) for dx, dy in circle]
    for kind in ("bright", "dark"):
        flags = [(v > c + t) if kind == "bright" else (v < c - t) for v in vals]
        ext = flags + flags
        run = best = 0
        for f in ext:
            run = run + 1 if f else 0
            best = max(best, run)
        if best >= 9:
            return True
    return False


def test_fast_matches_bruteforce_oracle():
    img = _textured_image(80, 100, n_blobs=40, seed=3)
    ok, score = fast_detect(img, 20)
    ys, xs = np.nonzero(ok)
    assert len(ys) > 10
    # every detection passes the brute-force test; a sample of
    # non-detections fails it
    for y, x in zip(ys[:200], xs[:200]):
        assert _fast_oracle(img, x, y, 20), (x, y)
    rng = np.random.RandomState(0)
    checked = 0
    while checked < 200:
        y, x = rng.randint(4, 76), rng.randint(4, 96)
        if not ok[y, x]:
            assert not _fast_oracle(img, x, y, 20), (x, y)
            checked += 1
    assert (score[ok] > 0).all()


def test_extract_budget_and_coverage():
    img = _textured_image()
    orb = OrbPipeline(n_features=800)
    kp, octv, desc, ang = orb.extract(img)
    assert 300 <= len(kp) <= 800, len(kp)
    assert desc.shape == (len(kp), 32) and desc.dtype == np.uint8
    assert octv.min() >= 0 and octv.max() < 8
    # quadtree coverage: most of an 8x10 grid holds at least one keypoint
    gy = np.clip((kp[:, 1] / 60).astype(int), 0, 7)
    gx = np.clip((kp[:, 0] / 64).astype(int), 0, 9)
    cells = set(zip(gy.tolist(), gx.tolist()))
    # interior cells only (borders lose EDGE_THRESHOLD px)
    interior = [(i, j) for i in range(1, 7) for j in range(1, 9)]
    covered = sum(1 for c in interior if c in cells)
    assert covered >= 0.85 * len(interior), (covered, len(interior))


def test_quadtree_prefers_response_and_respects_budget():
    rng = np.random.RandomState(1)
    xy = rng.randint(0, 200, (500, 2))
    resp = rng.randint(1, 1000, 500)
    keep = distribute_quadtree(xy, resp, 0, 200, 0, 200, 100)
    assert len(keep) <= 100
    assert len(set(keep.tolist())) == len(keep)
    # dense cluster + lone far point: the lone point must survive
    xy2 = np.concatenate([rng.randint(0, 20, (99, 2)),
                          np.array([[190, 190]])])
    resp2 = np.concatenate([np.full(99, 100), [1]])
    keep2 = distribute_quadtree(xy2, resp2, 0, 200, 0, 200, 10)
    assert 99 in keep2.tolist()


def test_descriptor_matching_under_rotation():
    """rBRIEF must match a rotated copy of the same scene."""
    img = _textured_image(300, 300, n_blobs=150, seed=5)
    orb = OrbPipeline(n_features=300, n_levels=4)
    kp1, _, d1, _ = orb.extract(img)
    # rotate image by 15 degrees around center
    th = np.deg2rad(15)
    H, W = img.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(float)
    cx, cy = W / 2, H / 2
    xs = np.cos(th) * (xx - cx) - np.sin(th) * (yy - cy) + cx
    ys = np.sin(th) * (xx - cx) + np.cos(th) * (yy - cy) + cy
    xi = np.clip(np.round(xs).astype(int), 0, W - 1)
    yi = np.clip(np.round(ys).astype(int), 0, H - 1)
    rot = img[yi, xi]
    kp2, _, d2, _ = orb.extract(rot)
    assert len(kp1) > 50 and len(kp2) > 50
    idx = matcher.match_descriptors(d1, d2, max_dist=64)
    good = 0
    for i, j in enumerate(idx):
        if j < 0:
            continue
        # expected position of kp1[i] in the rotated image (inverse map)
        x, y = kp1[i]
        xr = np.cos(th) * (x - cx) + np.sin(th) * (y - cy) + cx
        yr = -np.sin(th) * (x - cx) + np.cos(th) * (y - cy) + cy
        if np.hypot(kp2[int(j)][0] - xr, kp2[int(j)][1] - yr) < 3.0:
            good += 1
    n_matched = int((idx >= 0).sum())
    assert n_matched >= 30, n_matched
    assert good >= 0.6 * n_matched, (good, n_matched)


def test_undistort_roundtrip():
    K4 = np.array([450.0, 452.0, 320.0, 240.0])
    dist = np.array([-0.28, 0.07, 1e-4, -2e-4, 0.0])
    rng = np.random.RandomState(2)
    pts = np.stack([rng.uniform(50, 590, 200), rng.uniform(40, 440, 200)], 1)
    distorted = distort_points(pts, K4, dist)
    undone = undistort_points(distorted, K4, dist)
    err = np.abs(undone - pts).max()
    assert err < 0.05, err
    # zero coefficients: identity
    np.testing.assert_array_equal(
        undistort_points(pts, K4, np.zeros(5)), pts
    )


def test_blur_and_orientation_sanity():
    img = _textured_image(100, 100, n_blobs=30, seed=7)
    b = gaussian_blur7(img)
    assert b.shape == img.shape and b.dtype == np.uint8
    # blur reduces total variation
    tv = lambda a: np.abs(np.diff(a.astype(int), axis=0)).sum()
    assert tv(b) < tv(img)
    # orientation equivariance: a bright corner rotated 90 deg rotates angle
    img2 = np.zeros((64, 64), np.uint8)
    img2[28:36, 28:48] = 255  # horizontal bar from center
    a1 = orientations(img2, np.array([[32, 32]]))[0]
    a2 = orientations(np.rot90(img2).copy(), np.array([[32, 32]]))[0]
    d = np.abs((a2 - a1 + np.pi) % (2 * np.pi) - np.pi)
    assert abs(d - np.pi / 2) < 0.2, (a1, a2)


def test_rotation_consistency_filter():
    """rotHist semantics: matches whose angle difference disagrees with the
    dominant rotation get rejected (ORBmatcher.cc ComputeThreeMaxima)."""
    rng = np.random.RandomState(0)
    n = 60
    idx = np.arange(n)
    ang1 = rng.uniform(-np.pi, np.pi, n)
    ang2 = ang1 - np.deg2rad(20)  # consistent 20-degree rotation
    bad = [5, 17, 40]
    ang2[bad] += np.deg2rad(140)  # inconsistent outliers
    out = matcher.rotation_consistency(idx, ang1, ang2)
    for b in bad:
        assert out[b] == -1
    kept = (out >= 0).sum()
    assert kept >= n - len(bad) - 3  # bin-edge stragglers at most
    # unmatched entries stay unmatched
    idx2 = idx.copy()
    idx2[0] = -1
    out2 = matcher.rotation_consistency(idx2, ang1, ang2)
    assert out2[0] == -1


def test_native_orb_matches_python_oracle():
    """The C++ pipeline (native/orb_fast.cpp) must reproduce the NumPy
    oracle bit-for-bit: same keypoints, octaves, descriptors, and angles
    (both sides use round-half-even and identical float64 arithmetic)."""
    from amcslam_tpu import native

    if not native.available("orb_fast"):
        import pytest

        pytest.skip("no native toolchain")
    img = _textured_image(300, 400, n_blobs=300, seed=7)
    p = OrbPipeline(n_features=500)
    xyN, ocN, deN, anN = p.extract(img)
    xyP, ocP, deP, anP = p.extract(img, force_python=True)
    assert len(xyN) == len(xyP) > 100
    assert np.array_equal(xyN, xyP)
    assert np.array_equal(ocN, ocP)
    assert np.array_equal(deN, deP)
    assert np.allclose(anN, anP, atol=1e-12)
