"""Levenberg-Marquardt driver with g2o-exact control law, as one jitted loop.

Reproduces `OptimizationAlgorithmLevenberg::solve`
(Thirdparty/g2o/g2o/core/optimization_algorithm_levenberg.cpp:61-166) with
`lax.while_loop`s so the whole optimization — including the data-dependent
trial loop — compiles to a single XLA program:

  * one linearization (buildSystem) per outer iteration
  * lambda_0 = user value if > 0 else tau * max|diag H|, tau = 1e-5
  * trial loop (<= max_trials=10): solve (H + lambda I) dx = b, retract,
    rho = (chi - chi') / (dx . (lambda dx + b) + 1e-3)
    - accept (rho > 0, finite): lambda *= max(1/3, min(2/3, 1-(2 rho-1)^3)),
      nu = 2
    - reject: lambda *= nu, nu *= 2, state restored (we always retract from
      the linearization point, so rejection = keep old state)
  * terminate when the trial loop exhausts (qmax == max_trials) or rho == 0
  * "Raul" stop: 3 consecutive outer iterations with relative chi2
    improvement < 1e-3

A "problem" is a namespace of jit-traceable closures over SoA edge data:
  chi2(state)            -> robust total chi2 of active edges
  linearize(state)       -> lin  (opaque pytree: H parts, b, masks)
  max_abs_diag(lin)      -> scalar (active slots only)
  solve(lin, lam)        -> (dx pytree, dot_xx, dot_xb)
  retract(state, dx)     -> state
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LMProblem(NamedTuple):
    chi2: Callable[[Any], jax.Array]
    linearize: Callable[[Any], Any]
    max_abs_diag: Callable[[Any], jax.Array]
    solve: Callable[[Any, jax.Array], tuple[Any, jax.Array, jax.Array]]
    retract: Callable[[Any, Any], Any]


class LMStats(NamedTuple):
    chi2: jax.Array          # final robust chi2
    iterations: jax.Array    # outer iterations executed
    lam: jax.Array           # final lambda
    initial_chi2: jax.Array


class LMCarry(NamedTuple):
    """Full LM loop state, checkpointable between outer iterations.

    Segmenting a schedule through `lm_segment` (e.g. 10 iterations as
    4+3+3 with host abort checks between segments) reproduces the single
    `lm_optimize` call bit-for-bit: every quantity an outer iteration reads
    is carried, so the op sequence is identical — this is what backs the
    reference's `setForceStopFlag` force-stop (g2o
    optimization_algorithm_levenberg.cpp:61-166 checked per iteration;
    Optimizer.cc:79-80/1254-1255 pass &mbAbortBA / &mbStopGBA)."""

    state: Any
    chi: jax.Array
    lam: jax.Array
    ni: jax.Array
    nbad: jax.Array
    it: jax.Array
    term: jax.Array
    chi0: jax.Array


def lm_init(problem: LMProblem, state0: Any) -> LMCarry:
    """Start an LM run: evaluate chi2 once and build the zero-iteration carry."""
    chi0 = problem.chi2(state0)
    dtype = chi0.dtype
    return LMCarry(
        state=state0,
        chi=chi0,
        lam=jnp.asarray(0.0, dtype),
        ni=jnp.asarray(2.0, dtype),
        nbad=jnp.asarray(0, jnp.int32),
        it=jnp.asarray(0, jnp.int32),
        term=jnp.asarray(False),
        chi0=chi0,
    )


def lm_segment(
    problem: LMProblem,
    carry: LMCarry,
    num_iterations,
    lambda_init: float = 0.0,
    tau: float = 1e-5,
    max_trials: int = 10,
) -> LMCarry:
    """Advance the LM loop until `carry.it` reaches `num_iterations` (an
    ABSOLUTE cap, traceable so segment programs are shape-stable) or the
    g2o termination criteria fire. Resume by calling again with a higher cap.
    """
    dtype = carry.chi.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    it_end = jnp.asarray(num_iterations, jnp.int32)

    def outer_body(carry):
        state, cur_chi, lam, ni, nbad, it, terminated = carry
        # g2o recomputes activeRobustChi2 here, but the state is unchanged
        # since the last accepted trial — the carried value is identical and
        # saves one full residual evaluation per outer iteration.
        ini_chi = cur_chi
        lin = problem.linearize(state)

        lam0 = jnp.where(
            jnp.asarray(lambda_init, dtype) > 0,
            jnp.asarray(lambda_init, dtype),
            jnp.asarray(tau, dtype) * problem.max_abs_diag(lin),
        )
        lam = jnp.where(it == 0, lam0, lam)
        ni = jnp.where(it == 0, jnp.asarray(2.0, dtype), ni)
        nbad = jnp.where(it == 0, 0, nbad)

        def t_body(c):
            st, chi_c, lam_c, ni_c, rho_c, qmax_c, first = c
            dx, dot_xx, dot_xb = problem.solve(lin, lam_c)
            new_state = problem.retract(state, dx)
            temp_chi = problem.chi2(new_state)
            temp_chi = jnp.where(jnp.isfinite(temp_chi), temp_chi, big)
            scale = lam_c * dot_xx + dot_xb + jnp.asarray(1e-3, dtype)
            rho = (chi_c - temp_chi) / scale
            good = (rho > 0) & jnp.isfinite(temp_chi) & (temp_chi < big)

            alpha = 1.0 - (2.0 * rho - 1.0) ** 3
            scale_factor = jnp.maximum(
                jnp.asarray(1.0 / 3.0, dtype), jnp.minimum(alpha, jnp.asarray(2.0 / 3.0, dtype))
            )
            lam_new = jnp.where(good, lam_c * scale_factor, lam_c * ni_c)
            ni_new = jnp.where(good, jnp.asarray(2.0, dtype), ni_c * 2.0)
            st_new = jax.tree.map(
                lambda a, b: jnp.where(good, b, a), st, new_state
            )
            chi_new = jnp.where(good, temp_chi, chi_c)
            return (st_new, chi_new, lam_new, ni_new, rho, qmax_c + 1, False)

        def t_cond(c):
            _, _, _, _, rho, qmax, first = c
            return first | ((rho < 0) & (qmax < max_trials))

        (state_n, chi_n, lam_n, ni_n, rho_n, qmax_n, _) = lax.while_loop(
            t_cond,
            t_body,
            (state, cur_chi, lam, ni, jnp.asarray(0.0, dtype), 0, True),
        )

        term = (qmax_n == max_trials) | (rho_n == 0)
        raul_bad = (ini_chi - chi_n) * 1e3 < ini_chi
        nbad_n = jnp.where(raul_bad, nbad + 1, 0)
        term = term | (nbad_n >= 3)
        return (state_n, chi_n, lam_n, ni_n, nbad_n, it + 1, term)

    def outer_cond(carry):
        _, _, _, _, _, it, terminated = carry
        return (it < it_end) & (~terminated)

    init = (
        carry.state, carry.chi, carry.lam, carry.ni, carry.nbad, carry.it,
        carry.term,
    )
    state, chi, lam, ni, nbad, it, term = lax.while_loop(outer_cond, outer_body, init)
    return LMCarry(state=state, chi=chi, lam=lam, ni=ni, nbad=nbad, it=it,
                   term=term, chi0=carry.chi0)


def lm_optimize(
    problem: LMProblem,
    state0: Any,
    num_iterations: int,
    lambda_init: float = 0.0,
    tau: float = 1e-5,
    max_trials: int = 10,
):
    """Run up to `num_iterations` LM outer iterations; returns (state, LMStats).

    Matches `SparseOptimizer::optimize` + the Levenberg control law above.
    One-segment wrapper over lm_init/lm_segment.
    """
    c = lm_segment(
        problem, lm_init(problem, state0), num_iterations,
        lambda_init=lambda_init, tau=tau, max_trials=max_trials,
    )
    return c.state, LMStats(chi2=c.chi, iterations=c.it, lam=c.lam,
                            initial_chi2=c.chi0)
