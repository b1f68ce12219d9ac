"""Independent NumPy float64 mini-g2o used as a parity oracle.

A deliberately separate implementation path: SE(3) exp/log via scipy
expm/logm, Jacobians via central finite differences over vertex retractions,
and the exact g2o Levenberg-Marquardt control law
(optimization_algorithm_levenberg.cpp:61-166). The JAX solver must match its
converged chi2 to <= 1e-6 relative on the same problem instances
(BASELINE.json north star).
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import expm, logm


def hat3(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def exp_se3(xi):
    W = np.zeros((4, 4))
    W[:3, :3] = hat3(xi[3:])
    W[:3, 3] = xi[:3]
    return expm(W)


def log_se3(T):
    L = np.real(logm(T))
    return np.concatenate([L[:3, 3], [L[2, 1], L[0, 2], L[1, 0]]])


def jr_inv_pose3(xi, h=1e-6):
    """Numerical inverse right Jacobian: solves Jr from its defining relation
    log(exp(xi)^-1 exp(xi + h e_k)) = Jr(xi) (h e_k)."""
    Jr = np.zeros((6, 6))
    Ti = np.linalg.inv(exp_se3(xi))
    for k in range(6):
        d = np.zeros(6)
        d[k] = h
        p = log_se3(Ti @ exp_se3(xi + d))
        m = log_se3(Ti @ exp_se3(xi - d))
        Jr[:, k] = (p - m) / (2 * h)
    return np.linalg.inv(Jr)


def gp_interp_pose(T1, T2, v1, v2, t1, t2, t):
    """Independent GP interpolation: full 12x12 matrix-product formulation
    (Lambda/Psi), not the Hermite closed form used by the JAX library."""
    dt = t2 - t1

    def Qi(d):
        Q = np.zeros((12, 12))
        Q[:6, :6] = d**3 / 3 * np.eye(6)
        Q[:6, 6:] = d**2 / 2 * np.eye(6)
        Q[6:, :6] = d**2 / 2 * np.eye(6)
        Q[6:, 6:] = d * np.eye(6)
        return Q

    def QiInv(d):
        Q = np.zeros((12, 12))
        Q[:6, :6] = 12 / d**3 * np.eye(6)
        Q[:6, 6:] = -6 / d**2 * np.eye(6)
        Q[6:, :6] = -6 / d**2 * np.eye(6)
        Q[6:, 6:] = 4 / d * np.eye(6)
        return Q

    def Phi(d):
        P = np.eye(12)
        P[:6, 6:] = d * np.eye(6)
        return P

    Pt = Qi(t - t1) @ Phi(t2 - t).T @ QiInv(dt)
    At = Phi(t - t1) - Pt @ Phi(dt)
    xi12 = log_se3(np.linalg.inv(T1) @ T2)
    x1 = np.concatenate([np.zeros(6), v1])
    x2 = np.concatenate([xi12, jr_inv_pose3(xi12) @ v2])
    dxi = At[:6] @ x1 + Pt[:6] @ x2
    return T1 @ exp_se3(dxi)


class NPVertex:
    def __init__(self, value, dim, retract, fixed=False):
        self.value = value
        self.dim = dim
        self.retract = retract
        self.fixed = fixed


class NPEdge:
    def __init__(self, vids, residual, info, huber_delta=None, level=0):
        self.vids = vids
        self.residual = residual  # fn(values...) -> r
        self.info = np.atleast_2d(info)
        self.huber_delta = huber_delta
        self.level = level

    def r(self, vertices):
        return self.residual(*[vertices[i].value for i in self.vids])

    def chi2(self, vertices):
        r = self.r(vertices)
        return float(r @ self.info @ r)

    def robust(self, s):
        if self.huber_delta is None:
            return s, 1.0
        d2 = self.huber_delta**2
        if s <= d2:
            return s, 1.0
        sq = np.sqrt(s)
        return 2 * sq * self.huber_delta - d2, self.huber_delta / sq

    def jacobians(self, vertices, h=1e-6):
        """Central-difference Jacobians wrt each connected vertex retraction."""
        Js = []
        vals = [vertices[i].value for i in self.vids]
        for k, vid in enumerate(self.vids):
            v = vertices[vid]
            J = np.zeros((self.info.shape[0], v.dim))
            for j in range(v.dim):
                d = np.zeros(v.dim)
                d[j] = h
                vp = list(vals)
                vp[k] = v.retract(vals[k], d)
                rp = self.residual(*vp)
                vm = list(vals)
                vm[k] = v.retract(vals[k], -d)
                rm = self.residual(*vm)
                J[:, j] = (rp - rm) / (2 * h)
            Js.append(J)
        return Js


def robust_chi2(vertices, edges):
    c = 0.0
    for e in edges:
        if e.level != 0:
            continue
        c += e.robust(e.chi2(vertices))[0]
    return c


def np_lm(vertices, edges, num_iterations, lambda_init=0.0, tau=1e-5, max_trials=10,
          analytic_jacobians=None):
    """g2o-exact LM. Returns (chi2_history, final_lambda, n_iters).

    analytic_jacobians: optional dict {edge_index: fn(values...) -> [J...]}
    to share Jacobians with the system under test (isolates the control law).
    """
    idx = {}
    off = 0
    for i, v in enumerate(vertices):
        if not v.fixed:
            idx[i] = off
            off += v.dim
    P = off
    history = [robust_chi2(vertices, edges)]
    lam, ni, nbad = -1.0, 2.0, 0

    for it in range(num_iterations):
        ini_chi = robust_chi2(vertices, edges)
        cur_chi = ini_chi
        H = np.zeros((P, P))
        b = np.zeros(P)
        for ei, e in enumerate(edges):
            if e.level != 0:
                continue
            r = e.r(vertices)
            s = float(r @ e.info @ r)
            _, rho1 = e.robust(s)
            if analytic_jacobians and ei in analytic_jacobians:
                Js = analytic_jacobians[ei](*[vertices[i].value for i in e.vids])
            else:
                Js = e.jacobians(vertices)
            W = rho1 * e.info
            for a, va in enumerate(e.vids):
                if vertices[va].fixed:
                    continue
                ia = idx[va]
                da = vertices[va].dim
                b[ia:ia + da] -= Js[a].T @ W @ r
                for c, vc in enumerate(e.vids):
                    if vertices[vc].fixed:
                        continue
                    ic = idx[vc]
                    dc = vertices[vc].dim
                    H[ia:ia + da, ic:ic + dc] += Js[a].T @ W @ Js[c]

        if it == 0:
            lam = lambda_init if lambda_init > 0 else tau * np.abs(np.diag(H)).max()
            ni, nbad = 2.0, 0

        saved = [v.value for v in vertices]
        rho, qmax = 0.0, 0
        while True:
            try:
                dx = np.linalg.solve(H + lam * np.eye(P), b)
                ok = np.all(np.isfinite(dx))
            except np.linalg.LinAlgError:
                dx, ok = np.zeros(P), False
            for i, v in enumerate(vertices):
                if not v.fixed:
                    v.value = v.retract(saved[i], dx[idx[i]:idx[i] + v.dim])
            temp_chi = robust_chi2(vertices, edges) if ok else np.finfo(float).max
            if not np.isfinite(temp_chi):
                temp_chi = np.finfo(float).max
            scale = float(dx @ (lam * dx + b)) + 1e-3
            rho = (cur_chi - temp_chi) / scale
            if rho > 0 and np.isfinite(temp_chi) and temp_chi < np.finfo(float).max:
                alpha = 1.0 - (2 * rho - 1) ** 3
                lam *= max(1.0 / 3.0, min(alpha, 2.0 / 3.0))
                ni = 2.0
                cur_chi = temp_chi
            else:
                lam *= ni
                ni *= 2
                for i, v in enumerate(vertices):
                    v.value = saved[i]
            qmax += 1
            if not (rho < 0 and qmax < max_trials):
                break

        history.append(cur_chi)
        if qmax == max_trials or rho == 0:
            break
        if (ini_chi - cur_chi) * 1e3 < ini_chi:
            nbad += 1
        else:
            nbad = 0
        if nbad >= 3:
            break
    return history, lam, it + 1
