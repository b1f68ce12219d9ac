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
