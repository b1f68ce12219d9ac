"""Feature front-end (rebuild of src/ORBextractor.cc + Frame construction).

Extraction runs per camera over the host (OpenCV ORB, the same modified-
orb.cpp lineage as the reference's extractor) with the reference's pyramid
parameters; the multi-camera fan-out that the reference does with OpenMP
(Frame.cc:213-227) is a thread pool here. Stereo row-banded matching for
depth (`ComputeStereoMatches`, Frame.cc:763ff) runs as a batched device
program: Hamming distances of all left/right candidates in one popcount
matmul plus row masks, replacing the per-row search loops.

A Pallas FAST/BRIEF path is the natural next step for full on-device
extraction; the interface (extract() -> keypoints/octaves/descriptors) is
already device-agnostic.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax.numpy as jnp

from ..pipeline.map_store import Frame
from ..pipeline.matcher import hamming_table
from ..pipeline.rig import Rig


class ORBExtractor:
    """Per-camera ORB with the reference's defaults (ORBextractor.h:44-112):
    8-level pyramid, scale 1.2, FAST ini/min thresholds 20/7, per-camera
    feature budgets (SetNum, ORBextractor.h:61)."""

    def __init__(self, n_features=1200, scale_factor=1.2, n_levels=8,
                 ini_th_fast=20, min_th_fast=7):
        import cv2

        self._orb = cv2.ORB_create(
            nfeatures=n_features,
            scaleFactor=scale_factor,
            nlevels=n_levels,
            fastThreshold=ini_th_fast,
        )
        self._orb_low = cv2.ORB_create(
            nfeatures=n_features,
            scaleFactor=scale_factor,
            nlevels=n_levels,
            fastThreshold=min_th_fast,
        )
        self.n_features = n_features

    def set_num(self, n: int):
        self._orb.setMaxFeatures(n)
        self._orb_low.setMaxFeatures(n)

    def extract(self, image: np.ndarray):
        """-> (keypoints (N,2), octaves (N,), descriptors (N,32))."""
        import cv2

        if image.ndim == 3:
            image = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
        kps, desc = self._orb.detectAndCompute(image, None)
        if not kps:  # retry with the low threshold (ini/min semantics)
            kps, desc = self._orb_low.detectAndCompute(image, None)
        if not kps:
            return np.zeros((0, 2)), np.zeros(0, np.int64), np.zeros((0, 32), np.uint8)
        pts = np.array([k.pt for k in kps])
        octs = np.array([k.octave for k in kps], np.int64)
        return pts, octs, desc.astype(np.uint8)


def stereo_match_depth(
    kp_l, desc_l, kp_r, desc_r, bf: float, row_tol: float = 2.0,
    max_dist: int = 60, min_disp: float = 0.1,
):
    """Row-banded stereo matching -> (ur, depth) per left keypoint
    (MultiFrame::ComputeStereoMatches), batched on device."""
    n, m = len(kp_l), len(kp_r)
    if n == 0 or m == 0:
        return -np.ones(n), -np.ones(n)
    D = np.asarray(hamming_table(jnp.asarray(desc_l), jnp.asarray(desc_r)))
    row_ok = np.abs(kp_l[:, 1:2] - kp_r[None, :, 1]) <= row_tol
    disp = kp_l[:, 0:1] - kp_r[None, :, 0]
    disp_ok = disp > min_disp
    D = np.where(row_ok & disp_ok, D, 1 << 30)
    best = np.argmin(D, axis=1)
    bestd = D[np.arange(n), best]
    ok = bestd <= max_dist
    ur = np.where(ok, kp_r[best, 0], -1.0)
    depth = np.where(ok, bf / np.maximum(kp_l[:, 0] - ur, 1e-6), -1.0)
    depth = np.where(ok & (depth > 0), depth, -1.0)
    ur = np.where(depth > 0, ur, -1.0)
    return ur, depth


def build_frame(
    images: list[np.ndarray],
    timestamps: np.ndarray,
    rig: Rig,
    extractors: list[ORBExtractor],
    right_image: np.ndarray | None = None,
) -> Frame:
    """MultiFrame construction (Frame.cc:179-281): parallel per-camera
    extraction + undistortion, stereo depth, velocity carry-over is done by
    Tracking. `images` holds the N async + left-stereo images; `right_image`
    the stereo right."""
    with ThreadPoolExecutor(max_workers=len(images) + 1) as pool:
        futs = [
            pool.submit(extractors[c].extract, images[c]) for c in range(len(images))
        ]
        fut_r = (
            pool.submit(extractors[-1].extract, right_image)
            if right_image is not None
            else None
        )
        results = [f.result() for f in futs]
        right = fut_r.result() if fut_r is not None else None

    kps = [r[0] for r in results]
    octs = [r[1] for r in results]
    descs = [r[2] for r in results]
    ur = depth = None
    if right is not None:
        ur, depth = stereo_match_depth(
            kps[-1], descs[-1], right[0], right[2], rig.bf
        )
    return Frame(
        timestamp=float(timestamps[-1]),
        cam_times=np.asarray(timestamps, float),
        Twb=np.eye(4),
        velocity=np.zeros(6),
        keypoints=kps,
        kp_octaves=octs,
        descriptors=descs,
        kp_ur=ur,
        kp_depth=depth,
    )
