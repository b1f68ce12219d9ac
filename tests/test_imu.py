"""IMU preintegration + visual-inertial BA tests."""

import jax
import jax.numpy as jnp
import numpy as np

from amcslam_tpu.factors.imu import InertialState, imu_residual
from amcslam_tpu.ops import imu, lie
from amcslam_tpu.solver.vi_ba import VIBAData, VIBAState, make_vi_ba_problem, vi_ba
from amcslam_tpu.utils.synthetic import make_rig

F64 = jnp.float64
G = np.array([0.0, 0.0, -9.81])


def simulate_imu(n_steps=100, dt=0.005, seed=0, bias_g=None, bias_a=None):
    """Simulate ground-truth trajectory + perfect IMU measurements.

    Body-frame gyro = true angular velocity; accelerometer measures
    R^T (a_world - g) + bias.
    """
    rng = np.random.RandomState(seed)
    bias_g = np.zeros(3) if bias_g is None else bias_g
    bias_a = np.zeros(3) if bias_a is None else bias_a
    w_body = np.array([0.3, -0.2, 0.5])
    a_world_fn = lambda t: np.array([0.4 * np.sin(2 * t), 0.2, 0.1 * np.cos(t)])

    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([1.0, 0.0, 0.2])
    Rs, ps, vs = [R.copy()], [p.copy()], [v.copy()]
    gyro, acc = [], []
    for k in range(n_steps):
        t = k * dt
        a_w = a_world_fn(t)
        gyro.append(w_body + bias_g)
        acc.append(R.T @ (a_w - G) + bias_a)
        # integrate ground truth with the same discretization as the
        # preintegration (order: p, v, then R) for exact comparability
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.asarray(lie.exp_so3(jnp.asarray(w_body * dt, F64)))
        Rs.append(R.copy())
        ps.append(p.copy())
        vs.append(v.copy())
    return (
        np.array(acc), np.array(gyro), np.full(n_steps, dt),
        np.array(Rs), np.array(ps), np.array(vs),
    )


def test_preintegration_matches_direct_integration():
    acc, gyro, dts, Rs, ps, vs = simulate_imu(80)
    Nga = jnp.eye(6, dtype=F64) * 1e-6
    walk = jnp.eye(6, dtype=F64) * 1e-8
    pre = imu.preintegrate(
        jnp.asarray(acc, F64), jnp.asarray(gyro, F64), jnp.asarray(dts, F64),
        jnp.zeros(3, F64), jnp.zeros(3, F64), Nga, walk,
    )
    dT = float(pre.dT)
    # dR = R_0^T R_N;  dV = R_0^T (v_N - v_0 - g dT);  dP likewise
    dR_gt = Rs[0].T @ Rs[-1]
    dV_gt = Rs[0].T @ (vs[-1] - vs[0] - G * dT)
    dP_gt = Rs[0].T @ (ps[-1] - ps[0] - vs[0] * dT - 0.5 * G * dT * dT)
    np.testing.assert_allclose(np.asarray(pre.dR), dR_gt, atol=1e-8)
    np.testing.assert_allclose(np.asarray(pre.dV), dV_gt, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pre.dP), dP_gt, atol=1e-6)
    # covariance is PSD and grows with time
    evals = np.linalg.eigvalsh(np.asarray(pre.C))
    assert evals.min() > -1e-12


def test_bias_jacobians_first_order():
    """delta_with_bias must match re-preintegration at a shifted bias."""
    acc, gyro, dts, *_ = simulate_imu(60)
    Nga = jnp.eye(6, dtype=F64) * 1e-6
    walk = jnp.eye(6, dtype=F64) * 1e-8
    args = (jnp.asarray(acc, F64), jnp.asarray(gyro, F64), jnp.asarray(dts, F64))
    pre0 = imu.preintegrate(*args, jnp.zeros(3, F64), jnp.zeros(3, F64), Nga, walk)
    dbg = jnp.asarray([0.002, -0.001, 0.0015], F64)
    dba = jnp.asarray([0.01, -0.02, 0.005], F64)
    pre1 = imu.preintegrate(*args, dbg, dba, Nga, walk)
    dR1, dV1, dP1 = imu.delta_with_bias(pre0, dbg, dba)
    np.testing.assert_allclose(np.asarray(dR1), np.asarray(pre1.dR), atol=5e-6)
    np.testing.assert_allclose(np.asarray(dV1), np.asarray(pre1.dV), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dP1), np.asarray(pre1.dP), atol=5e-5)


def test_imu_residual_zero_at_ground_truth():
    acc, gyro, dts, Rs, ps, vs = simulate_imu(50)
    Nga = jnp.eye(6, dtype=F64) * 1e-6
    walk = jnp.eye(6, dtype=F64) * 1e-8
    pre = imu.preintegrate(
        jnp.asarray(acc, F64), jnp.asarray(gyro, F64), jnp.asarray(dts, F64),
        jnp.zeros(3, F64), jnp.zeros(3, F64), Nga, walk,
    )
    si = InertialState(jnp.asarray(Rs[0], F64), jnp.asarray(ps[0], F64), jnp.asarray(vs[0], F64))
    sj = InertialState(jnp.asarray(Rs[-1], F64), jnp.asarray(ps[-1], F64), jnp.asarray(vs[-1], F64))
    r = imu_residual(
        si, sj, jnp.zeros(3, F64), jnp.zeros(3, F64), pre,
        jnp.zeros(3, F64), jnp.zeros(3, F64), jnp.asarray(G, F64),
    )
    np.testing.assert_allclose(np.asarray(r), 0, atol=1e-6)


def test_vi_ba_converges():
    """Full VI-BA: 5 KFs on the simulated trajectory, landmarks observed by
    a mono camera, IMU factors between KFs; perturbed states recover."""
    rng = np.random.RandomState(3)
    n_kf = 5
    steps_per_kf = 40
    dt = 0.005
    acc, gyro, dts, Rs, ps, vs = simulate_imu(steps_per_kf * (n_kf - 1), dt=dt)
    kf_idx = np.arange(n_kf) * steps_per_kf

    Nga = jnp.eye(6, dtype=F64) * 1e-6
    walk = jnp.eye(6, dtype=F64) * 1e-8
    pres = []
    for k in range(n_kf - 1):
        sl = slice(k * steps_per_kf, (k + 1) * steps_per_kf)
        pres.append(
            imu.preintegrate(
                jnp.asarray(acc[sl], F64), jnp.asarray(gyro[sl], F64),
                jnp.asarray(dts[sl], F64), jnp.zeros(3, F64), jnp.zeros(3, F64),
                Nga, walk,
            )
        )
    pre_b = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)

    Tbc, Kin, bf = make_rig(2, 4)
    n_lm = 48
    X = rng.randn(n_lm, 3) * 3 + np.array([2.0, 0.0, 8.0])
    obs, okf, olm, ocam = [], [], [], []
    for k in range(n_kf):
        R, p = Rs[kf_idx[k]], ps[kf_idx[k]]
        for l in range(n_lm):
            c = 0
            Twb = np.eye(4); Twb[:3, :3] = R; Twb[:3, 3] = p
            Twc = Twb @ Tbc[c]
            Xc = np.linalg.inv(Twc)[:3] @ np.append(X[l], 1.0)
            if Xc[2] < 1.0:
                continue
            u = Kin[c, 0] * Xc[0] / Xc[2] + Kin[c, 2] + rng.randn() * 0.3
            v_ = Kin[c, 1] * Xc[1] / Xc[2] + Kin[c, 3] + rng.randn() * 0.3
            obs.append([u, v_]); okf.append(k); olm.append(l); ocam.append(c)
    E = len(obs)

    data = VIBAData(
        pre=pre_b,
        imu_pairs=jnp.asarray(np.stack([np.arange(n_kf - 1), np.arange(1, n_kf)], 1), jnp.int32),
        imu_valid=jnp.ones(n_kf - 1, bool),
        bg_lin=jnp.zeros((n_kf - 1, 3), F64),
        ba_lin=jnp.zeros((n_kf - 1, 3), F64),
        walk_info=jnp.eye(6, dtype=F64) * 1e4,
        gravity=jnp.asarray(G, F64),
        obs=jnp.asarray(np.array(obs), F64),
        obs_kf=jnp.asarray(okf, jnp.int32),
        obs_lm=jnp.asarray(olm, jnp.int32),
        obs_cam=jnp.asarray(ocam, jnp.int32),
        w=jnp.ones(E, F64),
        obs_valid=jnp.ones(E, bool),
        Tbc=jnp.asarray(Tbc, F64),
        K_intr=jnp.asarray(Kin, F64),
        pose_fixed=jnp.asarray(np.arange(n_kf) == 0),
    )

    gt = VIBAState(
        R=jnp.asarray(Rs[kf_idx], F64),
        p=jnp.asarray(ps[kf_idx], F64),
        v=jnp.asarray(vs[kf_idx], F64),
        bg=jnp.zeros((n_kf, 3), F64),
        ba=jnp.zeros((n_kf, 3), F64),
        X=jnp.asarray(X, F64),
    )
    # perturb
    Rp = np.asarray(gt.R).copy()
    for k in range(1, n_kf):
        Rp[k] = Rp[k] @ np.asarray(lie.exp_so3(jnp.asarray(rng.randn(3) * 0.01, F64)))
    state0 = VIBAState(
        R=jnp.asarray(Rp, F64),
        p=gt.p + jnp.asarray(rng.randn(n_kf, 3) * 0.05 * (np.arange(n_kf) > 0)[:, None], F64),
        v=gt.v + jnp.asarray(rng.randn(n_kf, 3) * 0.05 * (np.arange(n_kf) > 0)[:, None], F64),
        bg=gt.bg, ba=gt.ba,
        X=gt.X + jnp.asarray(rng.randn(n_lm, 3) * 0.02, F64),
    )

    problem = make_vi_ba_problem(data)
    chi0 = float(problem.chi2(state0))
    state, stats = jax.jit(lambda s: vi_ba(data, s, num_iterations=15))(state0)
    chi1 = float(stats.chi2)
    assert chi1 < 0.05 * chi0, (chi0, chi1)
    p_err0 = np.abs(np.asarray(state0.p) - np.asarray(gt.p)).max()
    p_err1 = np.abs(np.asarray(state.p) - np.asarray(gt.p)).max()
    assert p_err1 < 0.3 * p_err0, (p_err0, p_err1)
    # the fixed keyframe's FULL 15-dof state must be untouched — including
    # the bias components (regression: the Schur rewrite once left bg/ba of
    # fixed keyframes live through unmasked Jbg/Jba/Jw columns)
    np.testing.assert_allclose(np.asarray(state.R[0]), np.asarray(state0.R[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.p[0]), np.asarray(state0.p[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.v[0]), np.asarray(state0.v[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.bg[0]), np.asarray(state0.bg[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.ba[0]), np.asarray(state0.ba[0]), atol=1e-12)
