"""Camera model tests: projection Jacobians vs autodiff, Newton unprojection
roundtrip, DLT triangulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcslam_tpu.frontend import cameras
from amcslam_tpu.ops import lie

F64 = jnp.float64
KB8 = jnp.asarray([285.0, 286.0, 420.0, 400.0, -0.006, 0.04, -0.04, 0.008], F64)
PIN = jnp.asarray([420.0, 421.0, 480.0, 300.0], F64)


def test_pinhole_roundtrip_and_jac():
    rng = np.random.RandomState(0)
    for _ in range(5):
        Xc = jnp.asarray([rng.uniform(-2, 2), rng.uniform(-1, 1), rng.uniform(2, 20)], F64)
        uv = cameras.project_pinhole(PIN, Xc)
        ray = cameras.unproject_pinhole(PIN, uv)
        np.testing.assert_allclose(np.asarray(ray), np.asarray(Xc / Xc[2]), atol=1e-12)
        J = cameras.project_jac_pinhole(PIN, Xc)
        J_fd = jax.jacfwd(lambda X: cameras.project_pinhole(PIN, X))(Xc)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_fd), atol=1e-9)


def test_kb8_project_unproject_roundtrip():
    rng = np.random.RandomState(1)
    # wide angles (fisheye): up to ~70 degrees off-axis
    for _ in range(10):
        Xc = jnp.asarray(
            [rng.uniform(-3, 3), rng.uniform(-3, 3), rng.uniform(1.5, 10)], F64
        )
        uv = cameras.project_kb8(KB8, Xc)
        ray = cameras.unproject_kb8(KB8, uv)
        np.testing.assert_allclose(
            np.asarray(ray), np.asarray(Xc / Xc[2]), atol=1e-6
        )


def test_kb8_jacobian_matches_autodiff():
    rng = np.random.RandomState(2)
    for _ in range(5):
        Xc = jnp.asarray([rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 8)], F64)
        J = cameras.project_jac_kb8(KB8, Xc)
        J_fd = jax.jacfwd(lambda X: cameras.project_kb8(KB8, X))(Xc)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_fd), rtol=1e-6, atol=1e-8)


def test_triangulate_dlt():
    rng = np.random.RandomState(3)
    X = jnp.asarray([1.0, -0.5, 6.0], F64)
    T1 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.1, F64))
    T2 = lie.exp_se3(jnp.asarray(rng.randn(6) * 0.1 + np.array([1, 0, 0, 0, 0, 0]), F64))
    Tcw1, Tcw2 = lie.se3_inv(T1), lie.se3_inv(T2)
    r1 = lie.transform_point(Tcw1, X)
    r2 = lie.transform_point(Tcw2, X)
    Xt, w = cameras.triangulate_dlt(r1 / r1[2], r2 / r2[2], Tcw1, Tcw2)
    np.testing.assert_allclose(np.asarray(Xt), np.asarray(X), atol=1e-8)


def test_epipolar_constrain_pinhole_gates():
    """Pinhole::epipolarConstrain (Pinhole.cpp:107-129): true matches under a
    known relative pose pass the 3.84-sigma line gate, off-epipolar ones
    fail."""
    import numpy as np
    from amcslam_tpu.frontend.cameras import (
        epipolar_constrain_pinhole, project_pinhole,
    )

    rng = np.random.RandomState(3)
    params = jnp.asarray([120.0, 120.0, 80.0, 60.0])
    R12 = np.eye(3)
    t12 = np.array([0.3, 0.0, 0.0])
    X2 = np.stack([rng.uniform(-1, 1, 20), rng.uniform(-1, 1, 20),
                   rng.uniform(3, 8, 20)], 1)
    X1 = X2 @ R12.T + t12
    kp1 = np.asarray(jax.vmap(lambda x: project_pinhole(params, x))(
        jnp.asarray(X1)))
    kp2 = np.asarray(jax.vmap(lambda x: project_pinhole(params, x))(
        jnp.asarray(X2)))
    unc = jnp.ones(20)
    ok = epipolar_constrain_pinhole(
        params, params, jnp.asarray(kp1), jnp.asarray(kp2),
        jnp.asarray(R12), jnp.asarray(t12), unc)
    assert bool(jnp.all(ok))
    # push kp2 off the epipolar line (perpendicular = y for x-baseline)
    kp2_bad = kp2 + np.array([0.0, 9.0])
    bad = epipolar_constrain_pinhole(
        params, params, jnp.asarray(kp1), jnp.asarray(kp2_bad),
        jnp.asarray(R12), jnp.asarray(t12), unc)
    assert not bool(jnp.any(bad))


def test_triangulate_matches_kb8_recovers_depth():
    """KB8::TriangulateMatches (KannalaBrandt8.cpp:306-392): true fisheye
    correspondences triangulate to the right depth; zero-parallax pairs are
    rejected with z1 <= 0."""
    import numpy as np
    from amcslam_tpu.frontend.cameras import (
        epipolar_constrain_kb8, project_kb8, triangulate_matches,
        unproject_kb8,
    )

    rng = np.random.RandomState(4)
    params = jnp.asarray([285.0, 285.0, 320.0, 240.0,
                          -0.007, 0.04, -0.035, 0.005])
    R12 = np.eye(3)
    t12 = np.array([0.5, 0.05, 0.0])
    X1 = np.stack([rng.uniform(-2, 2, 16), rng.uniform(-2, 2, 16),
                   rng.uniform(4, 9, 16)], 1)
    X2 = (X1 - t12) @ R12
    kp1 = np.asarray(jax.vmap(lambda x: project_kb8(params, x))(jnp.asarray(X1)))
    kp2 = np.asarray(jax.vmap(lambda x: project_kb8(params, x))(jnp.asarray(X2)))
    s2 = jnp.ones(16)
    z1, p3d = triangulate_matches(
        unproject_kb8, unproject_kb8, project_kb8, project_kb8,
        params, params, jnp.asarray(kp1), jnp.asarray(kp2),
        jnp.asarray(R12), jnp.asarray(t12), s2, s2)
    assert bool(jnp.all(z1 > 0))
    np.testing.assert_allclose(np.asarray(p3d), X1, rtol=2e-2, atol=2e-2)
    assert bool(jnp.all(epipolar_constrain_kb8(
        params, params, jnp.asarray(kp1), jnp.asarray(kp2),
        jnp.asarray(R12), jnp.asarray(t12), s2, s2)))
    # zero baseline => pure-rotation pair: parallax gate must reject
    z0, _ = triangulate_matches(
        unproject_kb8, unproject_kb8, project_kb8, project_kb8,
        params, params, jnp.asarray(kp1), jnp.asarray(kp1),
        jnp.asarray(R12), jnp.zeros(3), s2, s2)
    assert bool(jnp.all(z0 <= 0))


def test_rectify_kb8_points_matches_pinhole_of_ray():
    """rectify_kb8_points(project_kb8(X)) must equal the ideal pinhole
    projection of X with the same fx/fy/cx/cy (the pipeline lift for KB8
    rigs, features.build_frame)."""
    from amcslam_tpu.frontend.cameras import project_kb8, rectify_kb8_points

    params = jnp.asarray([300.0, 300.0, 320.0, 240.0, 0.05, -0.01, 0.002, 0.0])
    rng = np.random.RandomState(3)
    X = np.stack([rng.uniform(-2, 2, 32), rng.uniform(-1.5, 1.5, 32),
                  rng.uniform(2, 8, 32)], 1)
    uv_fe = np.asarray(jax.vmap(lambda x: project_kb8(params, x))(jnp.asarray(X)))
    uv_rect = rectify_kb8_points(params, uv_fe)
    uv_pin = X[:, :2] / X[:, 2:3] * np.array([300.0, 300.0]) + np.array([320.0, 240.0])
    np.testing.assert_allclose(uv_rect, uv_pin, atol=1e-5)


def test_kb8_ray_grid_reprojects_to_pixel_centers():
    from amcslam_tpu.frontend.cameras import kb8_ray_grid, project_kb8

    params = jnp.asarray([300.0, 300.0, 320.0, 240.0, 0.05, -0.01, 0.002, 0.0])
    grid = kb8_ray_grid(np.asarray(params), 64, 48)
    assert grid.shape == (48, 64, 3)
    sub = grid[::16, ::16].reshape(-1, 3)
    uv = np.asarray(jax.vmap(lambda x: project_kb8(params, x))(jnp.asarray(sub)))
    u, v = np.meshgrid(np.arange(64)[::16], np.arange(48)[::16])
    exp = np.stack([u.ravel(), v.ravel()], 1).astype(float)
    np.testing.assert_allclose(uv, exp, atol=1e-6)


def test_rectify_kb8_gates_beyond_90deg_and_inflates_sigma():
    """ADVICE r4: a detection past 90-deg incidence must be flagged invalid
    (the tan lift would map it to a finite WRONG-SIDE pinhole coordinate),
    and survivors must carry the lift's measurement-variance inflation
    (largest eigenvalue of J J^T of the rectification Jacobian), growing
    toward the FOV edge."""
    from amcslam_tpu.frontend.cameras import project_kb8, rectify_kb8_points

    params = jnp.asarray([300.0, 300.0, 320.0, 240.0, 0.05, -0.01, 0.002, 0.0])

    def fe_pixel_at_theta(theta):
        X = np.array([np.sin(theta), 0.0, np.cos(theta)])
        return np.asarray(project_kb8(params, jnp.asarray(X)))

    thetas = np.deg2rad([5.0, 40.0, 70.0, 84.0, 100.0, 110.0])
    uv = np.stack([fe_pixel_at_theta(t) for t in thetas])
    out, valid, s2 = rectify_kb8_points(np.asarray(params), uv, return_aux=True)
    # <85 deg: valid; >=85 deg (incl. beyond-90 wrong-side cases): dropped
    assert valid.tolist() == [True, True, True, True, False, False]
    # the 100-deg pixel would have rectified to a finite wrong-side coord —
    # the validity flag is what keeps it out of the pipeline
    assert np.all(np.isfinite(out[4]))
    # inflation grows monotonically toward the edge and is ~1 near center
    assert s2[0] == pytest.approx(1.0, abs=0.05)
    assert s2[1] > s2[0] and s2[2] > s2[1] and s2[3] > s2[2]
    # numeric f64 check of the worst-direction inflation at 70 deg (below
    # the saturation angle poly^-1(pi/2), so the clipped reference
    # unprojection and the lift's unclipped solve agree there)
    def lift(p):
        from amcslam_tpu.frontend.cameras import unproject_kb8
        r = np.asarray(unproject_kb8(jnp.asarray(params, jnp.float64),
                                     jnp.asarray(p, jnp.float64)))
        return r[:2] / r[2] * np.asarray(params[:2]) + np.asarray(params[2:4])
    eps = 1e-5
    u2 = np.asarray(uv[2], np.float64)
    J = np.stack([(lift(u2 + eps * e) - lift(u2 - eps * e)) / (2 * eps)
                  for e in np.eye(2)], axis=1)
    lam_max = np.linalg.eigvalsh(J @ J.T).max()
    assert s2[2] == pytest.approx(lam_max, rel=1e-3)
    # the band just below 90 deg must NOT saturate: the 84-deg detection
    # rectifies to tan(84deg)*f + cx exactly, not to the saturation radius
    t84 = np.deg2rad(84.0)
    np.testing.assert_allclose(
        out[3], [np.tan(t84) * 300.0 + 320.0, 240.0], rtol=1e-5)


def test_build_frame_kb8_drops_invalid_and_carries_sigma_scale():
    """features.build_frame must (a) NOT radtan-undistort KB8 cameras even
    if rig.dist rows are nonzero (double correction), (b) drop beyond-limit
    detections before they become Frame keypoints, and (c) attach
    kp_sigma2_scale so solvers down-weight edge-of-FOV features
    (KeyFrame.kp_inv_sigma2)."""
    from amcslam_tpu.frontend.cameras import CAMERA_KB8, project_kb8
    from amcslam_tpu.frontend.features import build_frame
    from amcslam_tpu.pipeline.rig import Rig

    params = np.array([300.0, 300.0, 320.0, 240.0, 0.05, -0.01, 0.002, 0.0])
    rig = Rig(Tbc=np.stack([np.eye(4)] * 2), K=np.stack([params[:4]] * 2),
              bf=60.0, qc_diag=np.ones(6), n_levels=8)
    rig.dist = np.zeros((2, 5))
    rig.dist[0, 0] = 0.1  # would double-correct if the radtan pass ran
    rig.cam_model = np.array([CAMERA_KB8, 0], np.int32)
    rig.kb8_params = np.stack([params, np.zeros(8)])

    thetas = np.deg2rad([10.0, 50.0, 80.0, 100.0])
    uv = np.stack([
        np.asarray(project_kb8(jnp.asarray(params),
                               jnp.asarray([np.sin(t), 0.0, np.cos(t)])))
        for t in thetas
    ])

    class FakeExtractor:
        n_features = 4

        def extract(self, img):
            return (uv.copy(), np.zeros(len(uv), int),
                    np.zeros((len(uv), 32), np.uint8), np.zeros(len(uv)))

    f = build_frame([np.zeros((480, 640), np.uint8)] * 2, np.zeros(2), rig,
                    [FakeExtractor()] * 2)
    # 100-deg detection dropped from the KB8 camera only
    assert len(f.keypoints[0]) == 3
    assert len(f.keypoints[1]) == 4
    # rectified coords equal the exact pinhole of the ray (no radtan pass)
    exp = np.stack([[np.tan(t) * 300.0 + 320.0, 240.0] for t in thetas[:3]])
    np.testing.assert_allclose(f.keypoints[0], exp, atol=1e-3)
    # sigma scale present for the KB8 camera, None for the pinhole one
    assert f.kp_sigma2_scale[0] is not None and len(f.kp_sigma2_scale[0]) == 3
    assert f.kp_sigma2_scale[1] is None
    # and the weight helper divides by it
    w_center = f.kp_inv_sigma2(rig, 0, 0)
    w_edge = f.kp_inv_sigma2(rig, 0, 2)
    assert w_center == pytest.approx(rig.inv_sigma2(0), rel=0.06)
    assert w_edge < 0.2 * w_center
