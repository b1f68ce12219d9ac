"""Matmul-precision control for geometry kernels.

TPU MXU f32 matmuls default to fast bf16 passes (~8 significant bits), which
is catastrophic for Lie-group and GP-kernel algebra: Qi @ Phi^T @ QiInv mixes
O(dt^3) and O(1/dt^3) magnitudes and loses ~1e-3 absolute accuracy in the
interpolated pose. All small geometry matmuls therefore run at HIGHEST
precision — they are tiny (<= 12x12) so MXU throughput is irrelevant, and the
solver chooses precision explicitly for its large Schur-complement matmuls.
"""

from __future__ import annotations

import functools

import jax


def exact(fn):
    """Decorator: run fn with full-f32 (HIGHEST) matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
