"""Smoke test of the AMV replay CLI (examples/multicam_amv.py).

Writes a rendered dataset to disk in the AMV-Bench layout the reference's
System::LoadAmvImages expects (per-camera `camN/times.txt` + zero-padded
6-digit PNGs, `camN_right` for the stereo right; System.cc:1316-1400),
plus the three-tier config (run YAML + per-camera JSON calibration,
orb_multicam.yaml:1-33 / Tracking.cc:681-734), then runs the CLI end to
end in a subprocess exactly as a user would — images in, TUM trajectories
out."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_dataset(root, n_frames=6, fps=10.0):
    import cv2

    import e2e_rendered as e2e

    planes = e2e.make_world(0)
    rig = e2e.make_rig()
    Tright = np.eye(4)
    Tright[:3, 3] = [0.2, 0.0, 0.0]

    ds = os.path.join(root, "seq")
    for c in range(3):
        os.makedirs(os.path.join(ds, f"cam{c}"))
    os.makedirs(os.path.join(ds, "cam2_right"))

    times = [[] for _ in range(3)]
    for k in range(n_frames):
        ts = k / fps
        cam_t = rig.cam_times(ts)
        for c in range(3):
            img = e2e.render(e2e.gt_pose(cam_t[c]) @ rig.Tbc[c], planes)
            cv2.imwrite(os.path.join(ds, f"cam{c}", f"{k:06d}.png"), img)
            times[c].append(cam_t[c])
        img_r = e2e.render(e2e.gt_pose(ts) @ rig.Tbc[2] @ Tright, planes)
        cv2.imwrite(os.path.join(ds, "cam2_right", f"{k:06d}.png"), img_r)
    for c in range(3):
        np.savetxt(os.path.join(ds, f"cam{c}", "times.txt"), times[c])

    for c in range(3):
        K4 = rig.K[c]
        Km = [[K4[0], 0.0, K4[2]], [0.0, K4[1], K4[3]], [0.0, 0.0, 1.0]]
        with open(os.path.join(root, f"cam{c}.json"), "w") as f:
            json.dump({"sensor_to_vehicle": rig.Tbc[c].tolist(),
                       "intrinsics": Km}, f)

    yaml_path = os.path.join(root, "run.yaml")
    with open(yaml_path, "w") as f:
        f.write(
            "Camera.number: 3\n"
            "Camera.calibfiles: [cam0.json, cam1.json, cam2.json]\n"
            f"Camera.bf: {rig.bf}\n"
            f"dataset: {ds}\n"
            "Gaussian.Qc: [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]\n"
            "ORBextractor.nFeatures: 800\n"
            "loopClosing: 1\n"
        )
    return yaml_path


@pytest.mark.slow
def test_amv_cli_replay(tmp_path):
    yaml_path = _write_dataset(str(tmp_path))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "multicam_amv.py"),
         yaml_path, "--no-realtime", "--out", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "median tracking time" in proc.stdout

    traj = np.loadtxt(tmp_path / "f_0.txt").reshape(-1, 8)
    kf_traj = np.loadtxt(tmp_path / "kf_0.txt").reshape(-1, 8)
    assert len(traj) >= 4 and len(kf_traj) >= 1
    assert np.isfinite(traj).all() and np.isfinite(kf_traj).all()
    # quaternions normalized, timestamps monotone
    assert np.allclose(np.linalg.norm(traj[:, 4:], axis=1), 1.0, atol=1e-6)
    assert (np.diff(traj[:, 0]) > 0).all()
    # 6 frames of ~0.1 m/frame forward motion: the estimate must actually
    # move, and stay in the same ballpark as the ground-truth path length
    path = np.linalg.norm(np.diff(traj[:, 1:4], axis=0), axis=1).sum()
    assert 0.05 < path < 2.0, path
