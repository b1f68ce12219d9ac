"""On-device ORB extraction (frontend/orb_tpu.py) vs the NumPy oracle.

Small image / few levels to keep the compile tractable in the suite; the
semantics checked are the ones shared with frontend/orb.py: FAST corners,
cell retry, orientation, and the SAME BRIEF pattern (co-located keypoints
must produce near-identical descriptors across backends)."""

import numpy as np
import pytest

from amcslam_tpu.frontend.orb import OrbPipeline
from amcslam_tpu.frontend.orb_tpu import ORBExtractorTPU


def _structured_image(rng, H, W):
    img = np.zeros((H, W), np.float64)
    for _ in range(40):
        y, x = rng.randint(15, H - 15), rng.randint(15, W - 15)
        s = rng.randint(3, 8)
        img[y - s: y + s, x - s: x + s] += rng.uniform(40, 120)
    return np.clip(img + rng.randn(H, W) * 3 + 40, 0, 255).astype(np.uint8)


@pytest.mark.slow
def test_orb_tpu_matches_numpy_semantics():
    rng = np.random.RandomState(0)
    H, W = 160, 200
    img = _structured_image(rng, H, W)

    ref = OrbPipeline(n_features=200, n_levels=3)
    xy_r, oc_r, de_r, an_r = ref.extract(img, force_python=True)
    assert len(xy_r) > 50

    ext = ORBExtractorTPU(n_features=200, n_levels=3)
    xy_t, oc_t, de_t, an_t = ext.extract(img)
    assert len(xy_t) > 50

    # a solid majority of oracle keypoints are co-located on-device (the
    # selection policies differ: quadtree vs cell-best + top-K)
    matched = 0
    hamm = []
    for lv in range(3):
        a, b = xy_r[oc_r == lv], xy_t[oc_t == lv]
        da, db = de_r[oc_r == lv], de_t[oc_t == lv]
        if len(a) == 0 or len(b) == 0:
            continue
        d2 = np.sum((a[:, None, :] - b[None, :, :]) ** 2, -1)
        j = np.argmin(d2, axis=1)
        hit = d2[np.arange(len(a)), j] < 1.5 ** 2
        matched += int(hit.sum())
        for i in np.where(hit)[0]:
            hamm.append(np.unpackbits(da[i] ^ db[j[i]]).sum())
    assert matched >= 0.5 * len(xy_r), (matched, len(xy_r))
    # descriptors of co-located keypoints agree almost bit-for-bit (same
    # BRIEF pattern, same blur, same orientation formula)
    assert np.median(hamm) <= 8, np.median(hamm)
