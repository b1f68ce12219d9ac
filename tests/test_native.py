"""Native C++ runtime components: build, correctness vs Python/NumPy."""

import numpy as np
import pytest

from amcslam_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_hamming_matrix_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (37, 32)).astype(np.uint8)
    b = rng.randint(0, 256, (23, 32)).astype(np.uint8)
    D = native.hamming_matrix(a, b)
    bits_a = np.unpackbits(a, axis=1)
    bits_b = np.unpackbits(b, axis=1)
    D_ref = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(D, D_ref)


def test_build_obs_edges():
    # 2 KFs, 3 cameras (cam 2 = stereo), a few matches
    matches = np.array([5, -1, 7, 9, 5, -1, 11, 7], np.int64)
    kf_of = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.int32)
    cam_of = np.array([0, 1, 2, 2, 1, 0, 2, 0], np.int32)
    prev_slot = np.array([-1, 0], np.int32)
    lm_keys = np.array([5, 7, 9, 11], np.int64)
    lm_vals = np.array([0, 1, 2, 3], np.int32)
    mono, st = native.build_obs_edges(
        matches, kf_of, cam_of, prev_slot, lm_keys, lm_vals, 2
    )
    # stereo rows: kp 2 (kf0, lm 7->1), kp 3 (kf0, lm 9->2), kp 6 (kf1, lm 11->3)
    assert st.shape == (3, 3)
    np.testing.assert_array_equal(st[:, 0], [0, 0, 1])
    np.testing.assert_array_equal(st[:, 1], [1, 2, 3])
    np.testing.assert_array_equal(st[:, 2], [2, 3, 6])
    # mono rows: kp 0 is kf0 cam0 but prev_slot[0]=-1 -> dropped;
    # kp 4 (kf1 cam1 lm 5->0), kp 7 (kf1 cam0 lm 7->1), pairs (0,1)
    assert mono.shape == (2, 5)
    np.testing.assert_array_equal(mono[:, 0], [0, 0])
    np.testing.assert_array_equal(mono[:, 1], [1, 1])
    np.testing.assert_array_equal(mono[:, 2], [0, 1])
    np.testing.assert_array_equal(mono[:, 4], [4, 7])


def _numpy_window_match(u, v, vis, r_eff, lvl_lo, lvl_hi, ur_pred, mp_desc,
                        kp, kp_oct, kp_ur, kp_desc, max_dist, ratio,
                        use_ur):
    """Oracle: dense mask + table, mirroring the pre-native matcher path."""
    M, N = len(u), len(kp)
    du = np.abs(u[:, None] - kp[None, :, 0])
    dv = np.abs(v[:, None] - kp[None, :, 1])
    adm = (du <= r_eff) & (dv <= r_eff) & vis[:, None]
    adm &= (kp_oct[None, :] >= lvl_lo[:, None]) & (
        kp_oct[None, :] <= lvl_hi[:, None]
    )
    if use_ur:
        has = kp_ur[None, :] > 0
        adm &= ~has | (np.abs(ur_pred[:, None] - kp_ur[None, :]) <= r_eff)
    bits_a = np.unpackbits(mp_desc, axis=1)
    bits_b = np.unpackbits(kp_desc, axis=1)
    D = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1).astype(np.int64)
    D = np.where(adm, D, 1 << 30)
    best = D.argmin(1)
    bestd = D[np.arange(M), best]
    out = np.where(bestd <= max_dist, best, -1)
    if ratio > 0 and N > 1:
        D2 = D.copy()
        D2[np.arange(M), best] = 1 << 30
        second = D2.argmin(1)
        secondd = D2[np.arange(M), second]
        same = (kp_oct[best] == kp_oct[second]) & (secondd < (1 << 30))
        bad = same & (bestd > ratio * secondd)
        out = np.where(bad, -1, out)
    return out


def test_match_window_matches_numpy_oracle():
    rng = np.random.RandomState(3)
    M, N = 300, 250
    u = rng.uniform(0, 640, M).astype(np.float32)
    v = rng.uniform(0, 480, M).astype(np.float32)
    vis = rng.rand(M) > 0.2
    kp = np.stack([rng.uniform(0, 640, N), rng.uniform(0, 480, N)], 1)
    kp = kp.astype(np.float32)
    kp_oct = rng.randint(0, 8, N).astype(np.int32)
    kp_ur = np.where(rng.rand(N) > 0.5, rng.uniform(0, 640, N), -1.0)
    mp_desc = rng.randint(0, 256, (M, 32)).astype(np.uint8)
    # half the keypoints share a map point's descriptor so real matches exist
    kp_desc = rng.randint(0, 256, (N, 32)).astype(np.uint8)
    kp_desc[: N // 2] = mp_desc[: N // 2]

    # per-point radius mode with octave + ur gates and ratio test (frustum)
    r_pt = rng.uniform(20, 60, M).astype(np.float32)
    lvl_lo = rng.randint(0, 3, M).astype(np.int32)
    lvl_hi = lvl_lo + rng.randint(1, 5, M).astype(np.int32)
    ur_pred = (u - 30.0).astype(np.float32)
    got, _ = native.match_window(
        u, v, vis, r_pt, lvl_lo, lvl_hi, ur_pred, mp_desc,
        kp[:, 0], kp[:, 1], kp_oct, np.zeros(N, np.float32), kp_ur, kp_desc,
        max_dist=80, ratio=0.8, use_pt_radius=True, use_ur=True,
    )
    want = _numpy_window_match(
        u, v, vis, r_pt[:, None], lvl_lo, lvl_hi, ur_pred, mp_desc,
        kp, kp_oct, kp_ur, kp_desc, 80, 0.8, True,
    )
    np.testing.assert_array_equal(got, want)

    # per-keypoint radius mode, no gates (plain search_by_projection)
    kp_r = (7.0 * 1.2 ** kp_oct).astype(np.float32)
    got2, _ = native.match_window(
        u, v, vis, np.zeros(M, np.float32), np.zeros(M, np.int32),
        np.full(M, 1 << 20, np.int32), np.zeros(M, np.float32), mp_desc,
        kp[:, 0], kp[:, 1], kp_oct, kp_r, np.full(N, -1.0), kp_desc,
        max_dist=100, ratio=0.0, use_pt_radius=False, use_ur=False,
    )
    want2 = _numpy_window_match(
        u, v, vis, kp_r[None, :], np.zeros(M, np.int64),
        np.full(M, 1 << 20), np.zeros(M), mp_desc,
        kp, kp_oct, kp_ur, kp_desc, 100, 0.0, False,
    )
    np.testing.assert_array_equal(got2, want2)
