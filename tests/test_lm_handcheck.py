"""Adversarial hand-check of the LM control law against g2o's C++ source.

Both the jitted solver (`solver/lm.py`) and the parity oracle
(`tests/reference_lm.py`) implement g2o's Levenberg-Marquardt control law
(`/root/reference/Thirdparty/g2o/g2o/core/optimization_algorithm_levenberg.cpp`).
Their agreement alone cannot rule out a transcription error common to both.
This test is the third, independent transcription: every LM quantity of the
first two outer iterations is computed IN THE TEST BODY by explicit scalar
arithmetic, each step annotated with the exact C++ source line it
transcribes, on problems small enough that each number is auditable by eye:

  A. a linear least-squares problem (2 free dofs, identity info, no robust
     kernel) — H, b, dx, chi2, rho, lambda all in closed form;
  B. a Huber-robustified scalar-edge problem — checks rho[0] (chi2) vs
     rho[1] (H/b weight) placement against robust_kernel_impl.cpp:78-92.

The resulting numeric trace is published in PARITY.md ("LM control-law
hand-check").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from amcslam_tpu.solver.lm import LMProblem, lm_optimize

from reference_lm import NPEdge, NPVertex, np_lm


# --------------------------------------------------------------------------
# Case A: linear least squares  r_k = a_k . x - y_k   (no robust kernel)
# --------------------------------------------------------------------------
A = np.array([[1.0, 0.0], [0.0, 2.0], [1.0, 1.0]])
Y = np.array([1.0, -1.0, 2.0])
X0 = np.array([3.0, -2.0])

TAU = 1e-5          # optimization_algorithm_levenberg.cpp:46  (_tau = 1e-5)
MAX_TRIALS = 10     # :50  (_maxTrialsAfterFailure default 10)


def _hand_trace_linear(num_outer: int):
    """Explicit transcription of optimization_algorithm_levenberg.cpp:61-166
    for the linear problem above.  Returns per-iteration dicts."""
    x = X0.copy()
    out = []
    lam = None
    ni = 2.0            # :52  (_ni = 2)
    nbad = 0            # :97  (_nBad = 0 at iteration 0)
    for it in range(num_outer):
        r = A @ x - Y
        current_chi = float(r @ r)          # :83 activeRobustChi2 (info = I)
        ini_chi = current_chi               # :85 iniChi
        H = A.T @ A                         # :87 buildSystem: H = J^T W J
        b = -(A.T @ r)                      # buildSystem: b = -J^T W r
        if it == 0:                         # :93-97
            # computeLambdaInit (:170-184): tau * max |H_jj|
            lam = TAU * float(np.abs(np.diag(H)).max())
            ni = 2.0
            nbad = 0
        rho = 0.0
        qmax = 0
        while True:                         # :102-150 do-while
            dx = np.linalg.solve(H + lam * np.eye(2), b)   # :109-110
            x_try = x + dx                  # :115 update (Euclidean oplus)
            r_try = A @ x_try - Y
            temp_chi = float(r_try @ r_try)  # :124 activeRobustChi2
            # computeScale (:186-193): sum_j x_j (lambda x_j + b_j); +1e-3 (:131)
            scale = float(dx @ (lam * dx + b)) + 1e-3
            rho = (current_chi - temp_chi) / scale          # :129-132
            if rho > 0 and np.isfinite(temp_chi):           # :134
                alpha = 1.0 - (2.0 * rho - 1.0) ** 3        # :135
                alpha = min(alpha, 2.0 / 3.0)               # :137
                scale_factor = max(1.0 / 3.0, alpha)        # :138
                lam *= scale_factor                         # :139
                ni = 2.0                                    # :140
                current_chi = temp_chi                      # :141
                x = x_try                                   # discardTop (:142)
            else:                                           # :143-147
                lam *= ni
                ni *= 2.0
                # pop() — x unchanged
            qmax += 1                                       # :148
            if not (rho < 0 and qmax < MAX_TRIALS):         # :149
                break
        terminate = qmax == MAX_TRIALS or rho == 0          # :151-155
        # Raul stop criterion (:157-167)
        if (ini_chi - current_chi) * 1e3 < ini_chi:
            nbad += 1
        else:
            nbad = 0
        terminate = terminate or nbad >= 3
        out.append(
            dict(chi=current_chi, lam=lam, rho=rho, qmax=qmax,
                 terminate=terminate)
        )
        if terminate:
            break
    return out


def _jax_linear_problem():
    Aj = jnp.asarray(A)
    Yj = jnp.asarray(Y)

    def chi2(x):
        r = Aj @ x - Yj
        return r @ r

    def linearize(x):
        r = Aj @ x - Yj
        return (Aj.T @ Aj, -(Aj.T @ r))

    def max_abs_diag(lin):
        H, _ = lin
        return jnp.abs(jnp.diag(H)).max()

    def solve(lin, lam):
        H, b = lin
        dx = jnp.linalg.solve(H + lam * jnp.eye(2, dtype=H.dtype), b)
        return dx, dx @ dx, dx @ b

    def retract(x, dx):
        return x + dx

    return LMProblem(chi2, linearize, max_abs_diag, solve, retract)


def test_linear_first_iteration_closed_form():
    """Iteration 0, fully by hand: lambda_0, dx, chi2', rho, lambda_1."""
    r0 = A @ X0 - Y
    chi0 = float(r0 @ r0)
    H = A.T @ A                       # [[2,1],[1,5]]
    assert np.allclose(H, [[2.0, 1.0], [1.0, 5.0]])
    b = -(A.T @ r0)
    lam0 = TAU * 5.0                  # max diag = 5  -> 5e-5
    dx = np.linalg.solve(H + lam0 * np.eye(2), b)
    x1 = X0 + dx
    r1 = A @ x1 - Y
    chi1 = float(r1 @ r1)
    scale = float(dx @ (lam0 * dx + b)) + 1e-3
    rho = (chi0 - chi1) / scale
    assert rho > 0                    # linear problem: first step accepted
    alpha = 1.0 - (2.0 * rho - 1.0) ** 3
    lam1 = lam0 * max(1.0 / 3.0, min(alpha, 2.0 / 3.0))

    # the jitted solver, one outer iteration
    prob = _jax_linear_problem()
    x_j, stats = lm_optimize(prob, jnp.asarray(X0), num_iterations=1)
    np.testing.assert_allclose(float(stats.initial_chi2), chi0, rtol=1e-12)
    np.testing.assert_allclose(float(stats.chi2), chi1, rtol=1e-12)
    np.testing.assert_allclose(float(stats.lam), lam1, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(x_j), x1, rtol=1e-12)

    # the NumPy oracle, same problem expressed as NPVertex/NPEdge
    verts = [NPVertex(X0.copy(), 2, lambda v, d: v + d)]
    edges = [
        NPEdge([0], lambda x, k=k: np.atleast_1d(A[k] @ x - Y[k]), np.eye(1))
        for k in range(3)
    ]
    hist, lam_np, _ = np_lm(verts, edges, num_iterations=1)
    np.testing.assert_allclose(hist[0], chi0, rtol=1e-12)
    np.testing.assert_allclose(hist[-1], chi1, rtol=1e-9)  # FD jacobians
    np.testing.assert_allclose(lam_np, lam1, rtol=1e-9)


def test_linear_two_iterations_all_three_implementations():
    trace = _hand_trace_linear(2)
    prob = _jax_linear_problem()
    for n in (1, 2):
        _, stats = lm_optimize(prob, jnp.asarray(X0), num_iterations=n)
        np.testing.assert_allclose(float(stats.chi2), trace[n - 1]["chi"],
                                   rtol=1e-12, atol=1e-300)
        np.testing.assert_allclose(float(stats.lam), trace[n - 1]["lam"],
                                   rtol=1e-12)
        assert int(stats.iterations) == n

    verts = [NPVertex(X0.copy(), 2, lambda v, d: v + d)]
    edges = [
        NPEdge([0], lambda x, k=k: np.atleast_1d(A[k] @ x - Y[k]), np.eye(1))
        for k in range(3)
    ]
    hist, lam_np, _ = np_lm(verts, edges, num_iterations=2)
    np.testing.assert_allclose(hist[2], trace[1]["chi"], rtol=1e-9,
                               atol=1e-16)
    np.testing.assert_allclose(lam_np, trace[1]["lam"], rtol=1e-9)


# --------------------------------------------------------------------------
# Case B: Huber robustification placement (robust_kernel_impl.cpp:78-92)
# --------------------------------------------------------------------------
# Two scalar edges on one 1-dof vertex:  r1 = x - 10 (outlier, Huberized,
# delta=1), r2 = x (inlier anchor, no kernel).  At x0 = 0: e2 = 100 > 1 so
# rho[0] = 2*sqrt(100)*1 - 1 = 19, rho[1] = 1/sqrt(100) = 0.1.
DELTA = 1.0
X0B = np.array([0.0])


def test_huber_placement_first_iteration():
    x = float(X0B[0])
    r1, r2 = x - 10.0, x
    e2 = r1 * r1
    assert e2 > DELTA**2
    rho0 = 2.0 * np.sqrt(e2) * DELTA - DELTA**2     # robust_kernel_impl.cpp:88
    rho1 = DELTA / np.sqrt(e2)                      # :89
    chi0 = rho0 + r2 * r2            # robust chi2: rho[0] for kernel edges
    # buildSystem: the *weight* is rho[1] (base_edge robustInformation)
    H = rho1 * 1.0 + 1.0
    b = -(rho1 * r1 + r2)
    lam0 = TAU * H
    dx = b / (H + lam0)
    x1 = x + dx
    r1n, r2n = x1 - 10.0, x1
    e2n = r1n * r1n
    chi1 = (2.0 * np.sqrt(e2n) * DELTA - DELTA**2 if e2n > DELTA**2 else e2n) \
        + r2n * r2n
    scale = dx * (lam0 * dx + b) + 1e-3
    rho = (chi0 - chi1) / scale
    assert rho > 0
    lam1 = lam0 * max(1.0 / 3.0, min(1.0 - (2 * rho - 1) ** 3, 2.0 / 3.0))

    def chi2(xv):
        r1v = xv[0] - 10.0
        r2v = xv[0]
        e2v = r1v * r1v
        rob = jnp.where(e2v > DELTA**2,
                        2.0 * jnp.sqrt(e2v) * DELTA - DELTA**2, e2v)
        return rob + r2v * r2v

    def linearize(xv):
        r1v = xv[0] - 10.0
        r2v = xv[0]
        e2v = r1v * r1v
        w1 = jnp.where(e2v > DELTA**2, DELTA / jnp.sqrt(e2v), 1.0)
        Hv = w1 * 1.0 + 1.0
        bv = -(w1 * r1v + r2v)
        return (Hv[None, None], bv[None])

    def max_abs_diag(lin):
        return jnp.abs(lin[0][0, 0])

    def solve(lin, lam):
        Hv, bv = lin
        dxv = bv / (Hv[0] + lam)
        return dxv, dxv @ dxv, dxv @ bv

    prob = LMProblem(chi2, linearize, max_abs_diag, solve,
                     lambda xv, dxv: xv + dxv)
    xj, stats = lm_optimize(prob, jnp.asarray(X0B), num_iterations=1)
    np.testing.assert_allclose(float(stats.initial_chi2), chi0, rtol=1e-12)
    np.testing.assert_allclose(float(stats.chi2), chi1, rtol=1e-12)
    np.testing.assert_allclose(float(stats.lam), lam1, rtol=1e-12)
    np.testing.assert_allclose(float(xj[0]), x1, rtol=1e-12)

    verts = [NPVertex(X0B.copy(), 1, lambda v, d: v + d)]
    edges = [
        NPEdge([0], lambda xv: np.atleast_1d(xv[0] - 10.0), np.eye(1),
               huber_delta=DELTA),
        NPEdge([0], lambda xv: np.atleast_1d(xv[0]), np.eye(1)),
    ]
    hist, lam_np, _ = np_lm(verts, edges, num_iterations=1)
    np.testing.assert_allclose(hist[0], chi0, rtol=1e-12)
    np.testing.assert_allclose(hist[-1], chi1, rtol=1e-9)
    np.testing.assert_allclose(lam_np, lam1, rtol=1e-9)


def test_rejected_step_lambda_ramp():
    """A forced-bad first trial: nu-doubling (:143-147) and state restore.

    Residual r = x^2 - 1 at x0 = 2 with a huge lambda-init forced OFF (we
    pass lambda_init so computeLambdaInit is bypassed, :93 + :171-173) —
    tiny lambda makes Gauss-Newton overshoot into higher chi2, so the trial
    loop must reject, multiply lambda by nu=2, double nu, and retry from the
    ORIGINAL state (pop, :146)."""

    def res(x):
        return x[0] * x[0] - 1.0

    def chi2(xv):
        return res(xv) ** 2

    def linearize(xv):
        J = 2.0 * xv[0]
        r = res(xv)
        return ((J * J)[None, None], (-J * r)[None])

    def max_abs_diag(lin):
        return jnp.abs(lin[0][0, 0])

    def solve(lin, lam):
        Hv, bv = lin
        dxv = bv / (Hv[0] + lam)
        return dxv, dxv @ dxv, dxv @ bv

    prob = LMProblem(chi2, linearize, max_abs_diag, solve,
                     lambda xv, dxv: xv + dxv)

    # hand trace with lambda_init = 1e-12: trial 1 may accept or reject
    # depending on geometry; replicate :102-150 exactly
    lam = 1e-12
    ni = 2.0
    x = 2.0
    r = x * x - 1.0
    chi0 = r * r
    H = (2 * x) ** 2
    b = -(2 * x) * r
    qmax = 0
    cur = chi0
    while True:
        dx = b / (H + lam)
        xt = x + dx
        rt = xt * xt - 1.0
        tc = rt * rt
        scale = dx * (lam * dx + b) + 1e-3
        rho = (cur - tc) / scale
        if rho > 0 and np.isfinite(tc):
            alpha = 1.0 - (2 * rho - 1) ** 3
            lam *= max(1.0 / 3.0, min(alpha, 2.0 / 3.0))
            ni = 2.0
            cur = tc
            x = xt
        else:
            lam *= ni
            ni *= 2.0
        qmax += 1
        if not (rho < 0 and qmax < MAX_TRIALS):
            break

    xj, stats = lm_optimize(prob, jnp.asarray([2.0]), num_iterations=1,
                            lambda_init=1e-12)
    np.testing.assert_allclose(float(stats.chi2), cur, rtol=1e-12)
    np.testing.assert_allclose(float(stats.lam), lam, rtol=1e-12)
    np.testing.assert_allclose(float(xj[0]), x, rtol=1e-12)


def test_publish_trace_values():
    """Pin the concrete numbers documented in PARITY.md (regression lock)."""
    trace = _hand_trace_linear(2)
    # chi2(x0) = |A x0 - y|^2 with x0=(3,-2): r0 = (2, -3, -1) -> 14
    r0 = A @ X0 - Y
    assert float(r0 @ r0) == pytest.approx(14.0)
    # lambda_0 = 1e-5 * maxdiag([[2,1],[1,5]]) = 5e-5; iteration 1 accepts
    # with rho ~= 1 so lambda *= 1/3 (alpha clipped at the lower bound);
    # iteration 2's tiny rho (5.2e-6) drives alpha -> 2/3 (upper clip).
    assert trace[0]["lam"] == pytest.approx(5e-5 / 3.0, rel=1e-12)
    assert trace[0]["chi"] == pytest.approx(1.000000005246632, rel=1e-12)
    assert trace[0]["rho"] == pytest.approx(0.9999230828397507, rel=1e-9)
    assert trace[1]["lam"] == pytest.approx(5e-5 / 3.0 * (2.0 / 3.0), rel=1e-12)
    assert trace[1]["chi"] == pytest.approx(1.0, rel=1e-12)
    # iteration 3 would terminate with rho == 0 exactly (:151-155)
    trace3 = _hand_trace_linear(3)
    assert trace3[2]["terminate"] and trace3[2]["rho"] == 0.0
