"""Benchmark: local GP bundle adjustment ms per LM iteration, 50 KF / 5k pts.

BASELINE.json north star: < 10 ms per LM iteration on one TPU v5e chip for a
50-keyframe / 5000-point GP-interpolated local BA window. One LM iteration =
one linearization (all residuals + analytic Jacobians), the landmark Schur
complement, the damped reduced Cholesky solve, landmark back-substitution,
manifold retraction, and the re-evaluated robust chi2 — i.e. one full accepted
trial of `OptimizationAlgorithmLevenberg::solve`.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = baseline_ms / measured_ms (>1 = faster than target).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from amcslam_tpu.solver.ba import make_ba_problem  # noqa: E402
from amcslam_tpu.utils.synthetic import make_local_ba_problem  # noqa: E402

BASELINE_MS = 10.0


def main():
    dtype = jnp.float32
    # 50 KF / 5k points; ~4 stereo obs + 2 async GP obs per point
    data, state0, gt = make_local_ba_problem(
        n_kf=50,
        n_fixed=1,
        n_lm=5000,
        n_cams=6,
        obs_per_lm=4,
        gpobs_per_lm=2,
        noise_px=0.5,
        seed=0,
        dtype=dtype,
    )
    n_edges = int(data.mg_obs.shape[0] + data.st_obs.shape[0])
    print(
        f"# problem: K={data.n_poses} L={state0.X.shape[0]} "
        f"mono-GP={data.mg_obs.shape[0]} stereo={data.st_obs.shape[0]} "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )

    problem = make_ba_problem(data, data.mg_valid, data.sg_valid, data.st_valid)

    @jax.jit
    def lm_iteration(state, lam):
        lin = problem.linearize(state)
        dx, dot_xx, dot_xb = problem.solve(lin, lam)
        new_state = problem.retract(state, dx)
        chi = problem.chi2(new_state)
        return new_state, chi

    lam = jnp.asarray(1.0, dtype)
    t0 = time.time()
    state, chi = jax.block_until_ready(lm_iteration(state0, lam))
    print(f"# compile+first iter: {time.time() - t0:.1f}s chi2={float(chi):.1f}",
          file=sys.stderr)

    # timed steady-state iterations (chained, like the real LM loop)
    n_warm, n_iter = 3, 20
    s = state0
    for _ in range(n_warm):
        s, chi = lm_iteration(s, lam)
    jax.block_until_ready((s, chi))
    s = state0
    t0 = time.time()
    for _ in range(n_iter):
        s, chi = lm_iteration(s, lam)
    jax.block_until_ready((s, chi))
    ms = (time.time() - t0) / n_iter * 1e3

    print(f"# steady-state: {ms:.3f} ms/iter, final chi2={float(chi):.1f}",
          file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "local_gpba_ms_per_lm_iter_50kf_5kpts",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
