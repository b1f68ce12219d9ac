"""Parity of the fused Pallas GP-interp-chain kernel vs the pure-JAX path.

The kernel (ops/pallas_chain.py) must reproduce
vmap(gp_pair_pack) + vmap(gp_interp_pack) (factors/reprojection.py:254-367)
— the WNOA interpolation chain of GaussianProcess.cc:5-44 /
G2oTypes.cc:177-223.  Run in interpret mode on the CPU test mesh; the
compiled Mosaic path is exercised by the real-chip bench drives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcslam_tpu.factors import reprojection
from amcslam_tpu.ops import lie, pallas_chain


def _jax_packs(T1, v1, T2, v2, t1, t2, t):
    packs = jax.vmap(reprojection.gp_pair_pack)(T1, v1, T2, v2)
    return jax.vmap(reprojection.gp_interp_pack)(packs, T1, v1, t1, t2, t)


def _random_case(seed, n, dtype, near_pi=False, tiny=False):
    rng = np.random.default_rng(seed)
    xi1 = rng.normal(scale=0.8, size=(n, 6))
    if near_pi:
        ax = rng.normal(size=(n, 3))
        ax /= np.linalg.norm(ax, axis=1, keepdims=True)
        xi1[:, 3:] = ax * (np.pi - 1e-3)
    if tiny:
        xi1 *= 1e-6
    dxi = rng.normal(scale=(1e-7 if tiny else 0.3), size=(n, 6))
    T1 = jax.vmap(lie.exp_se3)(jnp.asarray(xi1, dtype))
    T2 = jax.vmap(lambda a, b: a @ lie.exp_se3(b))(T1, jnp.asarray(dxi, dtype))
    v1 = jnp.asarray(rng.normal(scale=0.5, size=(n, 6)), dtype)
    v2 = jnp.asarray(rng.normal(scale=0.5, size=(n, 6)), dtype)
    t1 = jnp.asarray(rng.uniform(0.0, 1.0, n), dtype)
    t2 = t1 + jnp.asarray(rng.uniform(0.05, 0.5, n), dtype)
    s = rng.uniform(0.0, 1.0, n)
    s[: n // 4] = 0.0  # interval endpoints
    s[n // 4: n // 2] = 1.0
    t = t1 + jnp.asarray(s, dtype) * (t2 - t1)
    return T1, v1, T2, v2, t1, t2, t


def _max_rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / (1.0 + np.abs(b))))


@pytest.mark.parametrize("case", ["generic", "near_pi", "tiny"])
def test_pallas_chain_matches_jax_f64(case):
    """Interpret-mode f64: algebra must match the JAX path to roundoff."""
    args = _random_case(3, 37, jnp.float64,
                        near_pi=case == "near_pi", tiny=case == "tiny")
    ref = _jax_packs(*args)
    got = pallas_chain.gp_interp_packs(*args, interpret=True)
    for k in ("Twb", "Tbw", "Q"):
        assert _max_rel(got[k], ref[k]) < 1e-12, (case, k)


def test_pallas_chain_matches_jax_f32():
    """f32 kernel vs f64 JAX oracle: inside the f32 conditioning envelope."""
    args64 = _random_case(7, 64, jnp.float64)
    ref = _jax_packs(*args64)
    args32 = tuple(jnp.asarray(a, jnp.float32) for a in args64)
    got = pallas_chain.gp_interp_packs(*args32, interpret=True)
    # the pure-JAX f32 path itself sits at this distance from f64
    jax32 = _jax_packs(*args32)
    for k in ("Twb", "Tbw", "Q"):
        d_kernel = _max_rel(got[k], ref[k])
        d_jax32 = _max_rel(jax32[k], ref[k])
        assert d_kernel < max(5e-5, 10.0 * d_jax32), (k, d_kernel, d_jax32)


def test_pallas_chain_padding_independent():
    """Lane padding must not change results (S not a multiple of 128)."""
    args = _random_case(11, 130, jnp.float64)
    full = pallas_chain.gp_interp_packs(*args, interpret=True)
    head = pallas_chain.gp_interp_packs(
        *(a[:5] for a in args), interpret=True)
    for k in ("Twb", "Tbw", "Q"):
        np.testing.assert_allclose(np.asarray(head[k]),
                                   np.asarray(full[k])[:5], rtol=0, atol=0)
