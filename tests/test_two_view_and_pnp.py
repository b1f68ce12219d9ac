"""Two-view reconstruction (F/H RANSAC) and MLPnP RANSAC tests."""

import jax
import jax.numpy as jnp
import numpy as np

from amcslam_tpu.ransac.mlpnp import PnPRansacData, mlpnp_dlt, mlpnp_gn, pnp_ransac
from amcslam_tpu.ransac.two_view import TwoViewData, reconstruct
from amcslam_tpu.ops import lie

F64 = jnp.float64
K4 = np.array([420.0, 420.0, 480.0, 300.0])


def _project(K, Xc):
    return np.array([K[0] * Xc[0] / Xc[2] + K[2], K[1] * Xc[1] / Xc[2] + K[3]])


def make_two_view(n=120, planar=False, noise=0.5, outlier_frac=0.1, seed=0, baseline=1.0):
    rng = np.random.RandomState(seed)
    R_gt = np.asarray(lie.exp_so3(jnp.asarray([0.02, -0.25, 0.03], F64)))
    t_gt = np.array([1.0, 0.05, 0.1])
    t_gt = t_gt / np.linalg.norm(t_gt) * baseline
    if planar:
        # points on a plane z = 8 + 0.2x + 0.1y (cam-1 frame)
        xy = rng.uniform(-4, 4, (n, 2))
        X = np.concatenate([xy, (8 + 0.2 * xy[:, :1] - 0.1 * xy[:, 1:2])], axis=1)
    else:
        X = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 20, n)], 1
        )
    kp1 = np.stack([_project(K4, x) for x in X])
    Xc2 = (R_gt @ X.T).T + t_gt
    kp2 = np.stack([_project(K4, x) for x in Xc2])
    kp1 += rng.randn(n, 2) * noise
    kp2 += rng.randn(n, 2) * noise
    bad = rng.rand(n) < outlier_frac
    kp2[bad] += rng.randn(int(bad.sum()), 2) * 60 + 30
    data = TwoViewData(
        kp1=jnp.asarray(kp1, F64),
        kp2=jnp.asarray(kp2, F64),
        valid=jnp.ones(n, bool),
        K=jnp.asarray(K4, F64),
        sigma=jnp.asarray(1.0, F64),
    )
    return data, R_gt, t_gt, bad


def test_two_view_fundamental_path():
    data, R_gt, t_gt, bad = make_two_view(planar=False, seed=1)
    H = 64
    samples = np.stack(
        [np.random.RandomState(h).choice(120, 8, replace=False) for h in range(H)]
    )
    res = jax.jit(lambda d, s: reconstruct(d, s))(data, jnp.asarray(samples, jnp.int32))
    assert bool(res.ok)
    assert not bool(res.used_homography)
    # Accuracy is bounded by the best minimal 8-point sample (the reference
    # does not refit on the inlier set either — the estimate is refined by
    # full BA downstream).
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=5e-2)
    t_est = np.array(res.t)
    t_est *= np.sign(np.dot(t_est, t_gt))
    np.testing.assert_allclose(t_est, t_gt, atol=8e-2)
    assert int(res.n_good) > 80


def test_faugeras_homography_decomposition():
    """The 8 Faugeras motion candidates of a plane-induced homography must
    contain the true (R, t/|t|) (ReconstructH, TwoViewReconstruction.cc:571ff).

    Note on model selection: for planar/low-parallax scenes F = [a]x H also
    fits exactly, so with the reference's RH > 0.50 rule either model can win
    on noise — selection itself is not a stable test target; the decomposition
    is.
    """
    from amcslam_tpu.ransac.two_view import _faugeras_motions

    R_gt = np.asarray(lie.exp_so3(jnp.asarray([0.05, -0.2, 0.1], F64)))
    t_gt = np.array([0.4, -0.1, 0.2])
    n_plane = np.array([0.1, -0.05, 1.0])
    n_plane /= np.linalg.norm(n_plane)
    d_plane = 8.0
    Km = np.array([[420.0, 0, 480.0], [0, 420.0, 300.0], [0, 0, 1]])
    H_euc = R_gt + np.outer(t_gt, n_plane) / d_plane
    H_pix = Km @ H_euc @ np.linalg.inv(Km)
    Rs, ts, degen = _faugeras_motions(
        jnp.asarray(H_pix, F64), jnp.asarray([420.0, 420.0, 480.0, 300.0], F64), F64
    )
    assert not bool(degen)
    t_unit = t_gt / np.linalg.norm(t_gt)
    errs = []
    for i in range(8):
        R_e = np.abs(np.asarray(Rs[i]) - R_gt).max()
        t_e = min(
            np.abs(np.asarray(ts[i]) - t_unit).max(),
            np.abs(np.asarray(ts[i]) + t_unit).max(),
        )
        errs.append(R_e + t_e)
    assert min(errs) < 1e-5, errs


def test_mlpnp_minimal_and_refined():
    rng = np.random.RandomState(3)
    R_gt = np.asarray(lie.exp_so3(jnp.asarray([0.3, -0.4, 0.2], F64)))
    t_gt = np.array([0.5, -1.0, 3.0])
    n = 10
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], 1)
    Xw = ((X - t_gt) @ R_gt)  # world points: Xc = R Xw + t
    bear = X / np.linalg.norm(X, axis=1, keepdims=True)
    R, t = mlpnp_dlt(jnp.asarray(Xw, F64), jnp.asarray(bear, F64))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-6)
    R2, t2 = mlpnp_gn(R, t, jnp.asarray(Xw, F64), jnp.asarray(bear, F64),
                      jnp.ones(n, F64))
    np.testing.assert_allclose(np.asarray(R2), R_gt, atol=1e-8)


def test_pnp_ransac_with_outliers():
    rng = np.random.RandomState(4)
    R_gt = np.asarray(lie.exp_so3(jnp.asarray([0.1, 0.3, -0.2], F64)))
    t_gt = np.array([0.2, 0.1, 1.0])
    n = 80
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 15, n)], 1)
    Xw = (X - t_gt) @ R_gt
    obs = np.stack([_project(K4, x) for x in X]) + rng.randn(n, 2) * 0.3
    bad = rng.rand(n) < 0.3
    obs[bad] += 40 + rng.randn(int(bad.sum()), 2) * 20
    bear_obs = np.stack(
        [(obs[:, 0] - K4[2]) / K4[0], (obs[:, 1] - K4[3]) / K4[1], np.ones(n)], 1
    )
    bear_obs /= np.linalg.norm(bear_obs, axis=1, keepdims=True)
    data = PnPRansacData(
        points=jnp.asarray(Xw, F64),
        bearings=jnp.asarray(bear_obs, F64),
        obs=jnp.asarray(obs, F64),
        K=jnp.asarray(K4, F64),
        w=jnp.ones(n, F64),
        valid=jnp.ones(n, bool),
        th2=jnp.full(n, 9.21, F64),
    )
    H = 48
    samples = np.stack(
        [np.random.RandomState(h).choice(n, 6, replace=False) for h in range(H)]
    )
    (R, t), inl, n_in = jax.jit(pnp_ransac)(data, jnp.asarray(samples, jnp.int32))
    good = (~bad).sum()
    assert int(n_in) >= 0.85 * good, (int(n_in), good)
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-2)
