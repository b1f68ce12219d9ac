"""Tracking-quality gates: isInFrustum-style local-map search
(Frame.cc:463-530 + ORBmatcher::SearchByProjection ORBmatcher.cc:43-147)
and MapPoint::UpdateNormalAndDepth (MapPoint.cc:611-702)."""

import numpy as np

from amcslam_tpu.pipeline import matcher
from amcslam_tpu.pipeline.map_store import KeyFrame, MapPoint


def _setup(n=30, seed=0):
    rng = np.random.RandomState(seed)
    K = np.array([400.0, 400.0, 320.0, 240.0])
    Tcw = np.eye(4)
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(5, 15, n)], 1)
    u = K[0] * X[:, 0] / X[:, 2] + K[2]
    v = K[1] * X[:, 1] / X[:, 2] + K[3]
    kp = np.stack([u, v], 1)
    desc = rng.randint(0, 256, (n, 32)).astype(np.uint8)
    return K, Tcw, X, kp, desc, rng


def test_frustum_rejects_behind_and_viewing_angle():
    K, Tcw, X, kp, desc, rng = _setup()
    n = len(X)
    normals = X / np.linalg.norm(X, axis=1, keepdims=True)  # toward camera ray
    dist = np.linalg.norm(X, axis=1)
    # max_dist == current dist -> predicted octave 0, matching the keypoints
    min_d = dist / 1.2 ** 7
    max_d = dist.copy()

    idx, in_f = matcher.search_by_projection_frustum(
        X, desc, normals, min_d, max_d, kp, desc,
        np.zeros(n, int), Tcw, K,
    )
    assert in_f.all()
    assert (idx == np.arange(n)).mean() > 0.95

    # point behind the camera -> not in frustum
    Xb = X.copy()
    Xb[0, 2] = -5.0
    _, in_f2 = matcher.search_by_projection_frustum(
        Xb, desc, normals, min_d, max_d, kp, desc, np.zeros(n, int), Tcw, K,
    )
    assert not in_f2[0] and in_f2[1:].all()

    # normal pointing AWAY from the viewing ray -> viewing-cone reject
    normals_bad = normals.copy()
    normals_bad[1] = -normals_bad[1]
    _, in_f3 = matcher.search_by_projection_frustum(
        X, desc, normals_bad, min_d, max_d, kp, desc, np.zeros(n, int), Tcw, K,
    )
    assert not in_f3[1]

    # distance outside the scale-invariance range -> reject
    max_d2 = max_d.copy()
    max_d2[2] = X[2, 2] * 0.5  # observed farther than 1.2 * max_dist
    _, in_f4 = matcher.search_by_projection_frustum(
        X, desc, normals, min_d, max_d2, kp, desc, np.zeros(n, int), Tcw, K,
    )
    assert not in_f4[2]


def test_frustum_octave_prediction_gates_matches():
    """A point whose predicted octave disagrees with the keypoint's octave
    must not match, even with identical descriptors."""
    K, Tcw, X, kp, desc, rng = _setup(seed=1)
    n = len(X)
    normals = X / np.linalg.norm(X, axis=1, keepdims=True)
    dist = np.linalg.norm(X, axis=1)
    # max_dist == dist -> predicted level 0
    idx0, _ = matcher.search_by_projection_frustum(
        X, desc, normals, dist / 1.2 ** 8, dist, kp, desc,
        np.zeros(n, int), Tcw, K,
    )
    assert (idx0 >= 0).sum() > 0.9 * n
    # keypoints claim octave 5 -> predicted 0 vs octave 5 mismatch
    idx5, _ = matcher.search_by_projection_frustum(
        X, desc, normals, dist / 1.2 ** 8, dist, kp, desc,
        np.full(n, 5, int), Tcw, K,
    )
    assert (idx5 >= 0).sum() == 0


def test_update_normal_and_depth():
    rng = np.random.RandomState(2)
    Tbc = np.stack([np.eye(4), np.eye(4)])
    kp = rng.uniform(0, 640, (4, 2))
    kf = KeyFrame(
        timestamp=0.0,
        cam_times=np.array([0.0, 0.0]),
        Twb=np.eye(4),
        velocity=np.zeros(6),
        keypoints=[np.zeros((0, 2)), kp],
        kp_octaves=[np.zeros(0, np.int64), np.array([2, 0, 0, 0])],
        descriptors=[np.zeros((0, 32), np.uint8),
                     rng.randint(0, 256, (4, 32)).astype(np.uint8)],
    )
    mp = MapPoint(position=np.array([0.0, 0.0, 8.0]), first_kf_id=kf.id)
    mp.add_observation(kf, 1, kf.global_index(1, 0))
    mp.update_normal_and_depth({kf.id: kf}, Tbc, 1.2, 8)
    # normal points from the camera toward the point (unit z here)
    np.testing.assert_allclose(mp.normal, [0, 0, 1], atol=1e-9)
    # octave 2 at 8 m: max = 8 * 1.2^2, min = max / 1.2^7
    np.testing.assert_allclose(mp.max_dist, 8.0 * 1.2 ** 2, rtol=1e-9)
    np.testing.assert_allclose(mp.min_dist, 8.0 * 1.2 ** 2 / 1.2 ** 7, rtol=1e-9)
