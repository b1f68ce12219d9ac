"""Dataset IO, ATE evaluation, viewer rendering."""

import os

import numpy as np

from amcslam_tpu.utils.io import ate_rmse, load_amv_images, read_tum
from amcslam_tpu.pipeline.viewer import draw_map
from amcslam_tpu.pipeline.map_store import Map, MapPoint, KeyFrame


def test_load_amv_images(tmp_path):
    # build a miniature AMV-layout dataset: 2 async cams + stereo pair
    n_cams = 3
    for c in range(n_cams):
        d = tmp_path / f"cam{c}"
        d.mkdir()
        times = np.arange(10) * 0.1 + (0.013 * c)
        np.savetxt(d / "times.txt", times)
    (tmp_path / f"cam{n_cams-1}_right").mkdir()
    ticks, stamps = load_amv_images(str(tmp_path), n_cams)
    assert len(ticks) > 0
    assert stamps.shape[1] == n_cams
    # stereo timestamp is the anchor; async times are at or before it
    assert (stamps[:, :-1] <= stamps[:, -1:] + 1e-9).all()
    # zero-padded 6-digit names
    assert os.path.basename(ticks[0][0]).startswith("000")
    assert len(ticks[0]) == n_cams + 1  # + right image


def test_tum_roundtrip_and_ate(tmp_path):
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(0)
    T = np.tile(np.eye(4), (20, 1, 1))
    T[:, :3, 3] = np.cumsum(rng.randn(20, 3) * 0.1, axis=0)
    t = np.arange(20) * 0.1
    path = str(tmp_path / "traj.txt")
    with open(path, "w") as f:
        for k in range(20):
            q = Rotation.from_matrix(T[k, :3, :3]).as_quat()
            p = T[k, :3, 3]
            f.write(f"{t[k]} {p[0]} {p[1]} {p[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n")
    t2, T2 = read_tum(path)
    np.testing.assert_allclose(T2, T, atol=1e-6)
    rmse, err = ate_rmse(t2, T2, t, T)
    assert rmse < 1e-9
    # perturbed trajectory has nonzero ATE
    T3 = T2.copy()
    T3[:, :3, 3] += rng.randn(20, 3) * 0.05
    rmse2, _ = ate_rmse(t2, T3, t, T, align=True)
    assert 0.005 < rmse2 < 0.2


def test_viewer_renders(tmp_path):
    m = Map()
    rng = np.random.RandomState(1)
    for i in range(3):
        kf = KeyFrame(
            timestamp=float(i), cam_times=np.zeros(2), Twb=np.eye(4),
            velocity=np.zeros(6), keypoints=[np.zeros((0, 2))] * 2,
            kp_octaves=[np.zeros(0, np.int64)] * 2,
            descriptors=[np.zeros((0, 32), np.uint8)] * 2,
        )
        kf.Twb[:3, 3] = [i, 0, 0]
        m.add_keyframe(kf)
    for _ in range(50):
        m.add_map_point(MapPoint(position=rng.randn(3) * 3))
    out = draw_map(m, path=str(tmp_path / "map.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000
