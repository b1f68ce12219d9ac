"""Per-frame pose-solver tests: LM control-law exactness vs the NumPy
oracle, convergence on synthetic multi-camera instances, g2o-parity chi2,
and outlier re-classification."""

import jax
import jax.numpy as jnp
import numpy as np

import reference_lm as ref
from amcslam_tpu.factors import gp_prior, reprojection
from amcslam_tpu.ops import lie
from amcslam_tpu.solver.lm import LMProblem, lm_optimize
from amcslam_tpu.solver.pose_solver import (
    PoseGPData,
    PoseState,
    make_problem,
    pose_gp_optimize,
)
from amcslam_tpu.utils.synthetic import make_pose_problem

F64 = jnp.float64


# ---------------------------------------------------------------------------
# Control-law exactness on a tiny shared-Jacobian problem
# ---------------------------------------------------------------------------


def _tiny_problem():
    """1 free 2-dof vertex, 3 nonlinear scalar residuals, one Huber edge."""
    targets = np.array([1.7, -0.3, 0.9])

    def residuals(x):
        return np.array(
            [
                np.exp(0.5 * x[0]) - targets[0],
                x[0] * x[1] - targets[1],
                np.sin(x[1]) - targets[2],
            ]
        )

    def jac(x):
        return np.array(
            [
                [0.5 * np.exp(0.5 * x[0]), 0.0],
                [x[1], x[0]],
                [0.0, np.cos(x[1])],
            ]
        )

    return residuals, jac


def test_lm_matches_oracle_exactly():
    """With identical Jacobians, the jitted LM must reproduce the oracle's
    chi2 to float64 roundoff for any iteration budget — validating the exact
    g2o control law (lambda init/update, trial loop, Raul stop)."""
    residuals, jacf = _tiny_problem()
    x0 = np.array([0.2, 0.4])

    for iters in [1, 2, 3, 5, 10, 25]:
        # oracle
        v = ref.NPVertex(x0.copy(), 2, lambda x, d: x + d)
        edges = [
            ref.NPEdge([0], residuals, np.eye(3), huber_delta=1.0),
        ]
        hist, lam_ref, nit = ref.np_lm(
            [v], edges, iters, analytic_jacobians={0: lambda x: [jacf(x)]}
        )

        # JAX problem (same math, traced)
        def jchi2(x):
            r = jnp.stack(
                [
                    jnp.exp(0.5 * x[0]) - 1.7,
                    x[0] * x[1] + 0.3,
                    jnp.sin(x[1]) - 0.9,
                ]
            )
            s = r @ r
            d2 = 1.0
            return jnp.where(s <= d2, s, 2.0 * jnp.sqrt(s) - d2)

        def jlin(x):
            r = jnp.stack(
                [
                    jnp.exp(0.5 * x[0]) - 1.7,
                    x[0] * x[1] + 0.3,
                    jnp.sin(x[1]) - 0.9,
                ]
            )
            J = jnp.asarray(
                [
                    [0.5 * jnp.exp(0.5 * x[0]), 0.0 * x[0]],
                    [x[1], x[0]],
                    [0.0 * x[0], jnp.cos(x[1])],
                ]
            )
            s = r @ r
            rho1 = jnp.where(s <= 1.0, 1.0, 1.0 / jnp.sqrt(s))
            H = rho1 * (J.T @ J)
            b = -rho1 * (J.T @ r)
            return H, b

        problem = LMProblem(
            chi2=jchi2,
            linearize=jlin,
            max_abs_diag=lambda lin: jnp.abs(jnp.diagonal(lin[0])).max(),
            solve=lambda lin, lam: (
                lambda dx: (dx, dx @ dx, dx @ lin[1])
            )(jnp.linalg.solve(lin[0] + lam * jnp.eye(2, dtype=F64), lin[1])),
            retract=lambda x, dx: x + dx,
        )
        xj, stats = lm_optimize(problem, jnp.asarray(x0, F64), iters)
        np.testing.assert_allclose(
            float(stats.chi2), hist[-1], rtol=1e-10,
            err_msg=f"iters={iters}",
        )
        assert int(stats.iterations) == nit, (iters, int(stats.iterations), nit)


# ---------------------------------------------------------------------------
# Pose solver on synthetic instances
# ---------------------------------------------------------------------------


def test_pose_solver_converges_to_ground_truth():
    data, state0, gt = make_pose_problem(n_mono=64, n_stereo=48, noise_px=0.0, seed=3)
    problem = make_problem(data, data.mg_valid, data.st_valid, huber_on=True)
    chi_before = float(problem.chi2(state0))
    state, stats = jax.jit(
        lambda s: lm_optimize(problem, s, num_iterations=10)
    )(state0)
    chi_after = float(stats.chi2)
    # At the optimum only the vertical-velocity regularizer remains:
    # ~ qcinv22 * 2 * vz^2 = 0.02 for vz = -0.1. Everything else -> 0.
    assert chi_after < 0.03, (chi_before, chi_after)
    T_err = np.abs(np.asarray(state.T[1]) - np.asarray(gt.T[1])).max()
    assert T_err < 1e-3, T_err


def test_pose_solver_oracle_parity_shared_jacobians():
    """Full pose problem vs the NumPy oracle, sharing the analytic Jacobian
    implementations (isolates H/b assembly + LM semantics). chi2 parity to
    1e-9 relative at every iteration budget."""
    data, state0, gt = make_pose_problem(n_mono=16, n_stereo=12, noise_px=0.5, seed=4)

    Tbc_np = np.asarray(data.Tbc)
    K_np = np.asarray(data.K)
    bf = float(data.bf)
    t_prev, t_cur = float(data.t_prev), float(data.t_cur)
    qi_inv = np.asarray(data.qi_inv)

    def pv_retract(val, d):
        T, v = val
        return (T @ ref.exp_se3(d[:6]), v + d[6:])

    vprev = ref.NPVertex(
        (np.asarray(state0.T[0]), np.asarray(state0.v[0])), 12, pv_retract, fixed=True
    )
    vcur = ref.NPVertex(
        (np.asarray(state0.T[1]), np.asarray(state0.v[1])), 12, pv_retract
    )
    vertices = [vprev, vcur]
    edges = []
    jacs = {}
    th_mono = np.sqrt(5.991)
    th_stereo = np.sqrt(7.815)

    # mono GP edges — residual via the oracle's independent matrix-product GP
    for i in range(16):
        obs = np.asarray(data.mg_obs[i])
        Xw = np.asarray(data.mg_Xw[i])
        t = float(data.mg_t[i])
        cam = int(data.mg_cam[i])

        def res(p1, p2, obs=obs, Xw=Xw, t=t, cam=cam):
            Twb = ref.gp_interp_pose(p1[0], p2[0], p1[1], p2[1], t_prev, t_cur, t)
            Twc = Twb @ Tbc_np[cam]
            Xc = np.linalg.inv(Twc)[:3] @ np.append(Xw, 1.0)
            u = K_np[cam, 0] * Xc[0] / Xc[2] + K_np[cam, 2]
            v = K_np[cam, 1] * Xc[1] / Xc[2] + K_np[cam, 3]
            return obs - np.array([u, v])

        def jac(p1, p2, obs=obs, Xw=Xw, t=t, cam=cam):
            _, J1, J2, _, _, _ = reprojection.mono_gp_residual_jac(
                jnp.asarray(p1[0]), jnp.asarray(p1[1]), t_prev,
                jnp.asarray(p2[0]), jnp.asarray(p2[1]), t_cur,
                t, jnp.asarray(Tbc_np[cam]), jnp.asarray(K_np[cam]),
                jnp.asarray(Xw), jnp.asarray(obs),
            )
            return [np.asarray(J1), np.asarray(J2)]

        jacs[len(edges)] = jac
        edges.append(ref.NPEdge([0, 1], res, np.eye(2), huber_delta=th_mono))

    # stereo-camera edges (unary on current)
    for i in range(12):
        obs = np.asarray(data.st_obs[i])
        Xw = np.asarray(data.st_Xw[i])
        stereo = bool(data.st_is_stereo[i])

        def res(p2, obs=obs, Xw=Xw, stereo=stereo):
            Twc = p2[0] @ Tbc_np[-1]
            Xc = np.linalg.inv(Twc)[:3] @ np.append(Xw, 1.0)
            u = K_np[-1, 0] * Xc[0] / Xc[2] + K_np[-1, 2]
            v = K_np[-1, 1] * Xc[1] / Xc[2] + K_np[-1, 3]
            if stereo:
                return obs - np.array([u, v, u - bf / Xc[2]])
            return np.append(obs[:2] - np.array([u, v]), 0.0)

        def jac(p2, obs=obs, Xw=Xw, stereo=stereo):
            _, J3, _, _ = reprojection.stereo_residual_jac(
                jnp.asarray(p2[0]), jnp.asarray(Tbc_np[-1]), jnp.asarray(K_np[-1]),
                bf, jnp.asarray(Xw), jnp.asarray(obs),
            )
            J = np.array(J3)
            if not stereo:
                J[2] = 0.0
            return [J]

        jacs[len(edges)] = jac
        edges.append(
            ref.NPEdge(
                [1], res, np.eye(3), huber_delta=(th_stereo if stereo else th_mono)
            )
        )

    # GP prior
    def res_gp(p1, p2):
        xi12 = ref.log_se3(np.linalg.inv(p1[0]) @ p2[0])
        rp = xi12 - (t_cur - t_prev) * p1[1]
        rv = ref.jr_inv_pose3(xi12) @ p2[1] - p1[1]
        return np.concatenate([rp, rv])

    def jac_gp(p1, p2):
        _, J1, J2 = gp_prior.gp_prior_residual_jac(
            jnp.asarray(p1[0]), jnp.asarray(p1[1]), t_prev,
            jnp.asarray(p2[0]), jnp.asarray(p2[1]), t_cur,
        )
        return [np.asarray(J1), np.asarray(J2)]

    jacs[len(edges)] = jac_gp
    edges.append(ref.NPEdge([0, 1], res_gp, qi_inv))

    # velocity edges
    for vid in range(2):
        def res_v(p, vid=vid):
            return np.array([p[1][2]])

        def jac_v(p, vid=vid):
            J = np.zeros((1, 12))
            J[0, 8] = 1.0
            return [J]

        jacs[len(edges)] = jac_v
        edges.append(ref.NPEdge([vid], res_v, np.array([[1.0]])))

    problem = make_problem(data, data.mg_valid, data.st_valid, huber_on=True)
    for iters in [1, 3, 10]:
        vprev.value = (np.asarray(state0.T[0]), np.asarray(state0.v[0]))
        vcur.value = (np.asarray(state0.T[1]), np.asarray(state0.v[1]))
        hist, _, nit = ref.np_lm(vertices, edges, iters, analytic_jacobians=jacs)

        state, stats = lm_optimize(problem, state0, num_iterations=iters)
        rel = abs(float(stats.chi2) - hist[-1]) / max(hist[-1], 1e-12)
        assert rel < 1e-9, (iters, float(stats.chi2), hist[-1], rel)
        assert int(stats.iterations) == nit
        # states agree too
        np.testing.assert_allclose(
            np.asarray(state.T[1]), vcur.value[0], atol=1e-7
        )
    # initial chi2 agreement between jax problem and oracle
    np.testing.assert_allclose(
        float(problem.chi2(state0)), hist[0], rtol=1e-9
    )


def test_pose_solver_outlier_schedule():
    """Full 4-round schedule flags injected gross outliers and still
    converges near ground truth (Optimizer.cc:548-675 semantics)."""
    data, state0, gt = make_pose_problem(
        n_mono=64, n_stereo=48, noise_px=0.5, outlier_frac=0.15, seed=5
    )
    run = jax.jit(
        lambda d, s: pose_gp_optimize(d, s, jnp.zeros(64, bool), jnp.zeros(48, bool))
    )
    state, lvl_m, lvl_s, (stats, n_inl) = run(data, state0)
    # pose error small despite 15% outliers
    T_err = np.abs(np.asarray(state.T[1]) - np.asarray(gt.T[1])).max()
    assert T_err < 2e-2, T_err
    # inlier count: all true inliers kept, most outliers rejected
    assert int(n_inl) >= 0.8 * (64 + 48) * 0.85
    assert int(n_inl) <= 64 + 48 - 0.8 * 0.15 * (64 + 48)
