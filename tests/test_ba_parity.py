"""Local-BA chi2 parity vs the NumPy g2o oracle with shared Jacobians.

Extends the pose-solver parity to the full Schur problem: poses + landmarks
+ GP chain + velocity edges. The oracle solves the JOINT dense system (no
Schur) with the identical LM control law — mathematically the same iterate
as our damped Schur solve — so chi2 must track to ~1e-8 relative
(BASELINE.json asks <=1e-6 vs g2o).
"""

import jax
import jax.numpy as jnp
import numpy as np

import reference_lm as ref
from amcslam_tpu.factors import gp_prior, reprojection
from amcslam_tpu.solver.ba import make_ba_problem
from amcslam_tpu.solver.lm import lm_optimize
from amcslam_tpu.utils.synthetic import make_local_ba_problem

F64 = jnp.float64


def test_local_ba_matches_oracle():
    data, state0, gt = make_local_ba_problem(
        n_kf=4, n_fixed=1, n_lm=14, obs_per_lm=2, gpobs_per_lm=1,
        noise_px=0.4, seed=11,
    )
    K = data.n_poses
    L = int(state0.X.shape[0])
    times = np.asarray(data.times)
    Tbc_st = np.asarray(data.Tbc_stereo)
    K_st = np.asarray(data.K_stereo)
    K_async = np.asarray(data.K_async)
    bf = float(data.bf)
    th_mono = np.sqrt(5.991)
    th_stereo = np.sqrt(7.815)

    def pv_retract(val, d):
        T, v = val
        return (T @ ref.exp_se3(d[:6]), v + d[6:])

    vertices = []
    for k in range(K):
        vertices.append(
            ref.NPVertex(
                (np.asarray(state0.T[k]), np.asarray(state0.v[k])),
                12, pv_retract, fixed=bool(data.pose_fixed[k]),
            )
        )
    lm_base = len(vertices)
    for l in range(L):
        vertices.append(
            ref.NPVertex(np.asarray(state0.X[l]).copy(), 3, lambda x, d: x + d)
        )

    edges, jacs = [], {}

    # stereo-camera KF edges
    n_st = int(np.asarray(data.st_valid).sum())
    for e in range(n_st):
        p = int(data.st_pose[e]); l = int(data.st_lm[e])
        obs = np.asarray(data.st_obs[e]); stereo = bool(data.st_is_stereo[e])
        w = float(data.st_w[e])

        def res(pv, X, obs=obs, stereo=stereo):
            Twc = pv[0] @ Tbc_st
            Xc = np.linalg.inv(Twc)[:3] @ np.append(X, 1.0)
            u = K_st[0]*Xc[0]/Xc[2] + K_st[2]
            v = K_st[1]*Xc[1]/Xc[2] + K_st[3]
            if stereo:
                return obs - np.array([u, v, u - bf/Xc[2]])
            return np.append(obs[:2] - np.array([u, v]), 0.0)

        def jac(pv, X, obs=obs, stereo=stereo):
            _, J3, Jl, _ = reprojection.stereo_residual_jac(
                jnp.asarray(pv[0]), jnp.asarray(Tbc_st), jnp.asarray(K_st),
                bf, jnp.asarray(X), jnp.asarray(obs))
            J3 = np.array(J3); Jl = np.array(Jl)
            if not stereo:
                J3[2] = 0; Jl[2] = 0
            return [J3, Jl]

        jacs[len(edges)] = jac
        edges.append(ref.NPEdge([p, lm_base + l], res, w * np.eye(3),
                                huber_delta=(th_stereo if stereo else th_mono)))

    # async-camera GP edges
    n_mg = int(np.asarray(data.mg_valid).sum())
    for e in range(n_mg):
        i = int(data.mg_pair[e, 0]); j = int(data.mg_pair[e, 1])
        l = int(data.mg_lm[e]); c = int(data.mg_cam[e])
        t = float(data.mg_t[e]); obs = np.asarray(data.mg_obs[e])
        w = float(data.mg_w[e])
        Tbc_c = np.asarray(state0.Text[c]); Kc = K_async[c]
        t1, t2 = float(times[i]), float(times[j])

        def res(p1, p2, X, obs=obs, t=t, t1=t1, t2=t2, Tbc_c=Tbc_c, Kc=Kc):
            Twb = ref.gp_interp_pose(p1[0], p2[0], p1[1], p2[1], t1, t2, t)
            Xc = np.linalg.inv(Twb @ Tbc_c)[:3] @ np.append(X, 1.0)
            return obs - np.array([Kc[0]*Xc[0]/Xc[2] + Kc[2],
                                   Kc[1]*Xc[1]/Xc[2] + Kc[3]])

        def jac(p1, p2, X, obs=obs, t=t, t1=t1, t2=t2, Tbc_c=Tbc_c, Kc=Kc):
            _, J1, J2, Jl, _, _ = reprojection.mono_gp_residual_jac(
                jnp.asarray(p1[0]), jnp.asarray(p1[1]), t1,
                jnp.asarray(p2[0]), jnp.asarray(p2[1]), t2,
                t, jnp.asarray(Tbc_c), jnp.asarray(Kc),
                jnp.asarray(X), jnp.asarray(obs))
            return [np.array(J1), np.array(J2), np.array(Jl)]

        jacs[len(edges)] = jac
        edges.append(ref.NPEdge([i, j, lm_base + l], res, w * np.eye(2),
                                huber_delta=th_mono))

    # GP chain + velocity edges
    qc22 = float(data.qcinv22)
    for e in range(int(np.asarray(data.gp_valid).sum())):
        i = int(data.gp_pairs[e, 0]); j = int(data.gp_pairs[e, 1])
        t1, t2 = float(times[i]), float(times[j])
        info = np.asarray(data.gp_qi_inv[e])

        def res_gp(p1, p2, t1=t1, t2=t2):
            xi = ref.log_se3(np.linalg.inv(p1[0]) @ p2[0])
            return np.concatenate([
                xi - (t2 - t1) * p1[1],
                ref.jr_inv_pose3(xi) @ p2[1] - p1[1],
            ])

        def jac_gp(p1, p2, t1=t1, t2=t2):
            _, J1, J2 = gp_prior.gp_prior_residual_jac(
                jnp.asarray(p1[0]), jnp.asarray(p1[1]), t1,
                jnp.asarray(p2[0]), jnp.asarray(p2[1]), t2)
            return [np.array(J1), np.array(J2)]

        jacs[len(edges)] = jac_gp
        edges.append(ref.NPEdge([i, j], res_gp, info))

    for k in range(K):
        if bool(data.pose_fixed[k]):
            continue

        def res_v(pv):
            return np.array([pv[1][2]])

        def jac_v(pv):
            J = np.zeros((1, 12)); J[0, 8] = 1.0
            return [J]

        jacs[len(edges)] = jac_v
        edges.append(ref.NPEdge([k], res_v, np.array([[qc22]])))

    # extrinsic priors at exact prior -> zero residual; extrinsics fixed:
    # contribute nothing; omitted on both sides (ext_fixed=True in data).

    problem = make_ba_problem(data, data.mg_valid, data.sg_valid, data.st_valid)
    for iters in [1, 3, 8]:
        for k in range(K):
            vertices[k].value = (np.asarray(state0.T[k]), np.asarray(state0.v[k]))
        for l in range(L):
            vertices[lm_base + l].value = np.asarray(state0.X[l]).copy()
        hist, _, nit = ref.np_lm(vertices, edges, iters,
                                 lambda_init=1.0, analytic_jacobians=jacs)
        state, stats = lm_optimize(problem, state0, iters, lambda_init=1.0)
        rel = abs(float(stats.chi2) - hist[-1]) / max(hist[-1], 1e-12)
        assert rel < 1e-6, (iters, float(stats.chi2), hist[-1], rel)
        assert int(stats.iterations) == nit, (iters, int(stats.iterations), nit)
    # initial chi2 parity too
    np.testing.assert_allclose(float(problem.chi2(state0)), hist[0], rtol=1e-9)
