"""amcslam_tpu — TPU-native asynchronous multi-camera SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AMC-SLAM
(continuous-time multi-camera SLAM with sparse-GP motion priors, built on
ORB-SLAM3). The numerical backend — Lie-group kernels, GP interpolation,
factor residuals/Jacobians, a g2o-semantics Levenberg-Marquardt solver with
landmark Schur complement — runs as batched, jitted device programs.

Layout:
  ops/       Lie groups (SO3/SE3/Sim3) and sparse-GP motion-prior kernels
  factors/   residual + analytic-Jacobian factor library (SoA, vmap-first)
  solver/    LM driver, robust kernels, Schur-complement BA problems
  ransac/    batched minimal solvers (Horn Sim3, velocity RANSAC, ...)
  parallel/  multi-chip sharding of the factor-graph linearization
  frontend/  camera models and host-side feature plumbing
  utils/     synthetic problem generators, config, trajectory IO
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM geometry is precision-critical: TPU f32 matmuls default to single-pass
# bf16 (~8 mantissa bits), which injects ~1e-3 absolute error into 4x4 pose
# compositions — far above the 1e-6 chi2-parity budget. Default the whole
# framework to true-f32 matmuls; performance-critical large matmuls in the
# solver opt back into faster precisions explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")
