"""Sim(3) kernels, Sim3 refinement, essential-graph, Horn RANSAC, MC-RANSAC."""

import jax
import jax.numpy as jnp
import numpy as np

from amcslam_tpu.ops import lie, sim3
from amcslam_tpu.ops.sim3 import Sim3
from amcslam_tpu.ransac.sim3_solver import Sim3RansacData, horn_sim3, sim3_ransac
from amcslam_tpu.ransac.vel_ransac import VelRansacData, mc_ransac
from amcslam_tpu.solver.sim3_opt import (
    EssentialGraphData,
    Sim3Field,
    Sim3PairData,
    optimize_essential_graph,
    optimize_sim3,
)
from amcslam_tpu.utils.synthetic import make_rig, _np_exp_se3

F64 = jnp.float64


def rand_sim3(rng, scale_spread=0.3):
    v = np.concatenate([rng.randn(3) * 0.4, rng.randn(3) * 1.0, [rng.randn() * scale_spread]])
    return sim3.exp_sim3(jnp.asarray(v, F64)), v


def test_sim3_exp_log_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        S, v = rand_sim3(rng)
        v2 = np.asarray(sim3.log_sim3(S))
        np.testing.assert_allclose(v2, v, rtol=1e-8, atol=1e-10)
    # small angle / small sigma corners
    for v in [np.zeros(7), np.array([1e-9] * 7), np.array([0, 0, 0, 1, 2, 3, 0.0])]:
        S = sim3.exp_sim3(jnp.asarray(v, F64))
        np.testing.assert_allclose(np.asarray(sim3.log_sim3(S)), v, atol=1e-8)


def test_sim3_group_ops():
    rng = np.random.RandomState(1)
    A, _ = rand_sim3(rng)
    B, _ = rand_sim3(rng)
    AB = sim3.mul(A, B)
    x = jnp.asarray(rng.randn(3), F64)
    np.testing.assert_allclose(
        np.asarray(sim3.act(AB, x)), np.asarray(sim3.act(A, sim3.act(B, x))), atol=1e-10
    )
    I = sim3.mul(A, sim3.inv(A))
    np.testing.assert_allclose(float(I.s), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(I.R), np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.asarray(I.t), 0, atol=1e-10)
    # matrix form consistency
    np.testing.assert_allclose(
        np.asarray(AB.matrix()), np.asarray(A.matrix() @ B.matrix()), atol=1e-10
    )


def _sim3_pair_instance(n=40, noise=0.3, seed=3, outlier_frac=0.0):
    rng = np.random.RandomState(seed)
    Tbc, K, bf = make_rig(3, seed)
    Tc_b = np.stack([np.linalg.inv(T) for T in Tbc])  # camera-from-body
    S_gt, _ = rand_sim3(np.random.RandomState(seed + 1), scale_spread=0.2)
    s_gt = float(S_gt.s)
    R_gt = np.asarray(S_gt.R)
    t_gt = np.asarray(S_gt.t)

    X2b = rng.randn(n, 3) * 3 + np.array([0, 0, 12.0])  # KF2 body frame
    X1b = (s_gt * (R_gt @ X2b.T).T + t_gt)  # KF1 body frame
    cam1 = rng.randint(0, 3, n)
    cam2 = rng.randint(0, 3, n)
    X1c = np.zeros((n, 3))
    X2c = np.zeros((n, 3))
    obs1 = np.zeros((n, 2))
    obs2 = np.zeros((n, 2))
    keep = np.ones(n, bool)
    for i in range(n):
        X1c[i] = Tc_b[cam1[i], :3, :3] @ X1b[i] + Tc_b[cam1[i], :3, 3]
        X2c[i] = Tc_b[cam2[i], :3, :3] @ X2b[i] + Tc_b[cam2[i], :3, 3]
        if X1c[i, 2] < 0.5 or X2c[i, 2] < 0.5:
            keep[i] = False
            X1c[i, 2] = X2c[i, 2] = 1.0
        for (Xc, obs, cam, Kk) in [(X1c[i], obs1[i], cam1[i], K), (X2c[i], obs2[i], cam2[i], K)]:
            obs[0] = Kk[cam, 0] * Xc[0] / Xc[2] + Kk[cam, 2] + rng.randn() * noise
            obs[1] = Kk[cam, 1] * Xc[1] / Xc[2] + Kk[cam, 3] + rng.randn() * noise
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(np.where(keep)[0], n_out, replace=False)
        obs1[idx] += 50 + rng.randn(n_out, 2) * 20
    data = Sim3PairData(
        X1=jnp.asarray(X1c, F64),
        X2=jnp.asarray(X2c, F64),
        obs1=jnp.asarray(obs1, F64),
        obs2=jnp.asarray(obs2, F64),
        cam1=jnp.asarray(cam1, jnp.int32),
        cam2=jnp.asarray(cam2, jnp.int32),
        w1=jnp.ones(n, F64),
        w2=jnp.ones(n, F64),
        valid=jnp.asarray(keep),
        K1=jnp.asarray(K, F64),
        K2=jnp.asarray(K, F64),
        Tc1b=jnp.asarray(Tc_b, F64),
        Tc2b=jnp.asarray(Tc_b, F64),
        fix_scale=jnp.asarray(False),
    )
    return data, (s_gt, R_gt, t_gt), (X1b, X2b)


def test_optimize_sim3_recovers_similarity():
    data, (s_gt, R_gt, t_gt), _ = _sim3_pair_instance(noise=0.2, outlier_frac=0.1)
    # perturbed init
    d = np.array([0.03, -0.02, 0.04, 0.2, -0.1, 0.15, 0.05])
    S0 = sim3.mul(sim3.exp_sim3(jnp.asarray(d, F64)), Sim3(
        s=jnp.asarray(s_gt, F64), R=jnp.asarray(R_gt, F64), t=jnp.asarray(t_gt, F64)))
    S, n_inl, inlier = jax.jit(lambda d_, S_: optimize_sim3(d_, S_, th2=10.0))(data, S0)
    np.testing.assert_allclose(float(S.s), s_gt, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(S.R), R_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(S.t), t_gt, atol=5e-2)
    assert int(n_inl) >= 0.8 * int(np.sum(np.asarray(data.valid))) - 4


def test_essential_graph_distributes_loop_error():
    """Chain 0-1-...-9 with odometry drift; loop edge 9->0 with the true
    relative Sim3. After optimization the loop constraint must be satisfied."""
    rng = np.random.RandomState(5)
    N = 10
    # ground truth: circular-ish trajectory, scale 1
    gt = [np.eye(4)]
    step = np.array([1.0, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / N])
    for k in range(1, N):
        gt.append(gt[-1] @ _np_exp_se3(step))
    # drifted estimates: noisy odometry integration
    est = [np.eye(4)]
    for k in range(1, N):
        noise = np.concatenate([rng.randn(3) * 0.03, rng.randn(3) * 0.01])
        est.append(est[-1] @ _np_exp_se3(step + noise))

    # vertices are S_cw (world-to-camera, scale 1): S_cw = inv(T_wc)
    s = np.ones(N)
    R = np.stack([np.linalg.inv(e)[:3, :3] for e in est])
    t = np.stack([np.linalg.inv(e)[:3, 3] for e in est])
    state = Sim3Field(s=jnp.asarray(s, F64), R=jnp.asarray(R, F64), t=jnp.asarray(t, F64))

    # Edge (i,j) residual is log(C * S_i * S_j^-1) with S_* = world-to-camera
    # (EdgeSim3); zero residual wants C = S_j S_i^-1 (the measured relative).
    # Odometry edges use the drifted estimates (consistent, zero initial
    # error); the loop edge 9->0 uses the ground-truth relative, carrying all
    # the accumulated drift (OptimizeEssentialGraph's loop-correction role).
    pairs, meas = [], []
    for k in range(N - 1):
        pairs.append((k, k + 1))
        meas.append(np.linalg.inv(est[k + 1]) @ est[k])
    pairs.append((N - 1, 0))
    meas.append(np.linalg.inv(gt[0]) @ gt[N - 1])

    E = len(pairs)
    data = EssentialGraphData(
        pairs=jnp.asarray(np.array(pairs), jnp.int32),
        meas_s=jnp.ones(E, F64),
        meas_R=jnp.asarray(np.stack([M[:3, :3] for M in meas]), F64),
        meas_t=jnp.asarray(np.stack([M[:3, 3] for M in meas]), F64),
        valid=jnp.ones(E, bool),
        fixed=jnp.asarray(np.arange(N) == 0),
        fix_scale=jnp.asarray(True),
    )
    state_out, stats = jax.jit(lambda s_: optimize_essential_graph(data, s_))(state)
    # the loop error gets distributed over the chain: chi2 drops well below
    # the initial (all-on-one-edge) value
    assert float(stats.chi2) < 0.3 * float(stats.initial_chi2), (
        float(stats.initial_chi2), float(stats.chi2))
    assert np.isfinite(np.asarray(state_out.t)).all()


def _make_pose_graph(N, seed=5, drift_t=0.03, drift_r=0.01, n_loops=1):
    """Drifted circular chain + n_loops true-relative loop edges; returns
    (state, data) in the EssentialGraphData layout."""
    rng = np.random.RandomState(seed)
    gt = [np.eye(4)]
    step = np.array([1.0, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / N])
    for k in range(1, N):
        gt.append(gt[-1] @ _np_exp_se3(step))
    est = [np.eye(4)]
    for k in range(1, N):
        noise = np.concatenate([rng.randn(3) * drift_t, rng.randn(3) * drift_r])
        est.append(est[-1] @ _np_exp_se3(step + noise))
    s = np.ones(N)
    R = np.stack([np.linalg.inv(e)[:3, :3] for e in est])
    t = np.stack([np.linalg.inv(e)[:3, 3] for e in est])
    state = Sim3Field(s=jnp.asarray(s, F64), R=jnp.asarray(R, F64),
                      t=jnp.asarray(t, F64))
    pairs, meas = [], []
    for k in range(N - 1):
        pairs.append((k, k + 1))
        meas.append(np.linalg.inv(est[k + 1]) @ est[k])
    for l in range(n_loops):
        a = (l * N // max(n_loops, 1)) % N
        b = (a + N // 2) % N
        if a == b:
            continue
        pairs.append((b, a))
        meas.append(np.linalg.inv(gt[a]) @ gt[b])
    E = len(pairs)
    data = EssentialGraphData(
        pairs=jnp.asarray(np.array(pairs), jnp.int32),
        meas_s=jnp.ones(E, F64),
        meas_R=jnp.asarray(np.stack([M[:3, :3] for M in meas]), F64),
        meas_t=jnp.asarray(np.stack([M[:3, 3] for M in meas]), F64),
        valid=jnp.ones(E, bool),
        fixed=jnp.asarray(np.arange(N) == 0),
        fix_scale=jnp.asarray(True),
    )
    return state, data


def test_essential_graph_pcg_matches_dense():
    """The matrix-free block-Jacobi PCG backend must agree with the dense
    Cholesky path (the at-scale replacement for LinearSolverEigen's sparse
    factorization, Optimizer.cc:1442-1444)."""
    state, data = _make_pose_graph(24, seed=11)
    out_d, st_d = jax.jit(
        lambda s_: optimize_essential_graph(data, s_, use_pcg=False)
    )(state)
    out_p, st_p = jax.jit(
        lambda s_: optimize_essential_graph(data, s_, use_pcg=True)
    )(state)
    # both reach the same optimum (chi2 agreement well under the parity bar)
    c_d, c_p = float(st_d.chi2), float(st_p.chi2)
    assert abs(c_p - c_d) <= 1e-6 * max(c_d, 1.0), (c_d, c_p)
    np.testing.assert_allclose(
        np.asarray(out_p.t), np.asarray(out_d.t), atol=1e-4
    )


def test_essential_graph_pcg_at_scale():
    """A 2000-vertex pose graph (out of reach for the 7Nx7N dense path's
    memory on bigger N) converges with the PCG backend."""
    state, data = _make_pose_graph(2000, seed=3, n_loops=4)
    out, stats = jax.jit(
        lambda s_: optimize_essential_graph(data, s_, use_pcg=True)
    )(state)
    assert np.isfinite(np.asarray(out.t)).all()
    assert float(stats.chi2) < 0.3 * float(stats.initial_chi2), (
        float(stats.initial_chi2), float(stats.chi2))


def test_essential_graph_10km_ate():
    """The at-scale north star: a 10 km, 4-lap drifted trajectory (2000 KF
    at 5 m spacing) with revisit loop closures, whose aligned ATE is brought
    well under 0.5% of path length by the PCG essential-graph optimization —
    the reference's headline contract at sparse-Cholesky scale
    (Optimizer::OptimizeEssentialGraph, Optimizer.cc:1390-1680 + 1442-1444).
    ATE follows the TUM convention: rigid (Umeyama) alignment then RMSE."""
    from amcslam_tpu.utils.synthetic import make_essential_graph

    n_kf, step_m = 2000, 5.0
    path_len = n_kf * step_m  # 10 km
    data, state0, Ts_gt = make_essential_graph(
        n_kf=n_kf, n_loop=60, drift=0.002, seed=4, step_m=step_m, laps=4
    )
    pg = Ts_gt[:, :3, 3]

    def ate_rmse(field):
        s = np.asarray(field.s)[:, None]
        R = np.asarray(field.R)
        t = np.asarray(field.t)
        # vertices store Scw: camera center in world = -R^T t / s
        p = -np.einsum("kij,kj->ki", R.transpose(0, 2, 1), t) / s
        mp_, mg = p.mean(0), pg.mean(0)
        U, _, Vt = np.linalg.svd((pg - mg).T @ (p - mp_))
        D = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
        Ra = U @ D @ Vt
        err = (p @ Ra.T + (mg - Ra @ mp_)) - pg
        return float(np.sqrt((err**2).sum(axis=1).mean()))

    ate0 = ate_rmse(state0)
    out, stats = jax.jit(
        lambda s_: optimize_essential_graph(data, s_, use_pcg=True)
    )(state0)
    ate1 = ate_rmse(out)
    # drifted input is visibly off; optimized is within 0.1% of path length
    # (5x tighter than the reference's 0.5% headline)
    assert ate0 > 0.002 * path_len, ate0
    assert ate1 < 0.001 * path_len, (ate0, ate1)
    assert ate1 < 0.3 * ate0, (ate0, ate1)


def test_horn_sim3_and_ransac():
    rng = np.random.RandomState(7)
    # exact similarity recovery from 3 points
    S_gt, _ = rand_sim3(np.random.RandomState(8), scale_spread=0.4)
    P2 = rng.randn(16, 3) * 2
    P1 = np.asarray(jax.vmap(lambda x: sim3.act(S_gt, x))(jnp.asarray(P2, F64)))
    s, R, t = horn_sim3(jnp.asarray(P1[:3], F64), jnp.asarray(P2[:3], F64), jnp.asarray(False))
    np.testing.assert_allclose(float(s), float(S_gt.s), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(R), np.asarray(S_gt.R), atol=1e-8)
    np.testing.assert_allclose(np.asarray(t), np.asarray(S_gt.t), atol=1e-8)

    # fixed-scale variant returns s = 1
    s1, _, _ = horn_sim3(jnp.asarray(P1[:3], F64), jnp.asarray(P2[:3], F64), jnp.asarray(True))
    assert float(s1) == 1.0

    # RANSAC with 30% outlier correspondences
    n = 60
    Tbc, K, bf = make_rig(2, 9)
    Tc_b = np.stack([np.linalg.inv(T) for T in Tbc])
    X2 = rng.randn(n, 3) * 2 + np.array([0, 0, 10.0])
    X1 = np.asarray(jax.vmap(lambda x: sim3.act(S_gt, x))(jnp.asarray(X2, F64)))
    bad = rng.rand(n) < 0.3
    X2_corrupt = X2.copy()
    X2_corrupt[bad] += rng.randn(int(bad.sum()), 3) * 5 + 3

    def proj(Xb, c, Kk):
        Xc = Tc_b[c, :3, :3] @ Xb + Tc_b[c, :3, 3]
        return np.array([Kk[c, 0] * Xc[0] / Xc[2] + Kk[c, 2], Kk[c, 1] * Xc[1] / Xc[2] + Kk[c, 3]])

    cam1 = rng.randint(0, 2, n)
    cam2 = rng.randint(0, 2, n)
    obs1 = np.stack([proj(X1[i], cam1[i], K) for i in range(n)])
    obs2 = np.stack([proj(X2[i], cam2[i], K) for i in range(n)])
    data = Sim3RansacData(
        Xb1=jnp.asarray(X1, F64),
        Xb2=jnp.asarray(X2_corrupt, F64),
        obs1=jnp.asarray(obs1, F64),
        obs2=jnp.asarray(obs2, F64),
        cam1=jnp.asarray(cam1, jnp.int32),
        cam2=jnp.asarray(cam2, jnp.int32),
        max_err1=jnp.full(n, 9.21, F64),
        max_err2=jnp.full(n, 9.21, F64),
        valid=jnp.ones(n, bool),
        K1=jnp.asarray(K, F64),
        K2=jnp.asarray(K, F64),
        Tc1b=jnp.asarray(Tc_b, F64),
        Tc2b=jnp.asarray(Tc_b, F64),
        fix_scale=jnp.asarray(False),
    )
    good_idx = np.where(~bad)[0]
    H = 32
    samples = np.stack(
        [np.random.RandomState(100 + h).choice(n, 3, replace=False) for h in range(H)]
    )
    (s_b, R_b, t_b), inl, n_best, n_all = jax.jit(sim3_ransac)(
        data, jnp.asarray(samples, jnp.int32)
    )
    assert int(n_best) >= 0.9 * len(good_idx), (int(n_best), len(good_idx))
    # inliers should be (mostly) the uncorrupted set
    assert np.asarray(inl)[~bad].mean() > 0.9


def test_mc_ransac():
    rng = np.random.RandomState(11)
    Tbc, K, bf = make_rig(3, 12)
    T_last = _np_exp_se3(rng.randn(6) * 0.2)
    v_true = np.array([1.5, 0.2, -0.1, 0.02, -0.05, 0.3])
    n = 64
    cam = rng.randint(0, 3, n)
    dt = rng.uniform(0.02, 0.12, n)
    Xw = np.zeros((n, 3))
    obs = np.zeros((n, 2))
    for i in range(n):
        Twc = T_last @ _np_exp_se3(v_true * dt[i]) @ Tbc[cam[i]]
        Xc = np.array([rng.uniform(-2, 2), rng.uniform(-1.5, 1.5), rng.uniform(4, 15)])
        Xw[i] = Twc[:3, :3] @ Xc + Twc[:3, 3]
        obs[i] = [
            K[cam[i], 0] * Xc[0] / Xc[2] + K[cam[i], 2] + rng.randn() * 0.3,
            K[cam[i], 1] * Xc[1] / Xc[2] + K[cam[i], 3] + rng.randn() * 0.3,
        ]
    bad = rng.rand(n) < 0.25
    obs[bad] += 30 + rng.randn(int(bad.sum()), 2) * 15

    data = VelRansacData(
        T_last=jnp.asarray(T_last, F64),
        v0=jnp.asarray(v_true + rng.randn(6) * 0.3, F64),
        dt=jnp.asarray(dt, F64),
        Xw=jnp.asarray(Xw, F64),
        obs=jnp.asarray(obs, F64),
        cam=jnp.asarray(cam, jnp.int32),
        w=jnp.ones(n, F64),
        valid=jnp.ones(n, bool),
        Tbc=jnp.asarray(Tbc, F64),
        K=jnp.asarray(K, F64),
    )
    H = 23  # maxIt in TrackLocalMap (Tracking.cc:2029)
    good = np.where(~bad)[0]
    samples = np.stack(
        [np.random.RandomState(h).choice(n, 3, replace=False) for h in range(H)]
    )
    ok, v_best, inl, n_in = jax.jit(
        lambda d, s: mc_ransac(d, s, threshold=3.0, min_match=30)
    )(data, jnp.asarray(samples, jnp.int32))
    assert bool(ok)
    assert int(n_in) >= 0.85 * len(good)
    # A 3-point minimal fit determines the twist only up to the pixel
    # tolerance over the short dt window (the reference does not refit on the
    # inlier set either, Tracking.cc:1977-1985) — the model just has to be
    # consistent enough to separate inliers from outliers.
    np.testing.assert_allclose(np.asarray(v_best), v_true, atol=0.6)
    # outliers correctly excluded
    assert np.asarray(inl)[bad].mean() < 0.3
