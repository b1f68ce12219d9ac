"""Piecewise on-chip profile of the TPU ORB extractor (frontend/orb_tpu.py).

Times each stage of the per-level pipeline (FAST masks, NMS + cell logic,
top-k selection, orientation, blur, BRIEF sampling) as separate jitted
programs on the real chip, plus the full batched extractor, to locate the
bottleneck. Not part of the test suite; a profiling aid.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from amcslam_tpu.frontend import orb_tpu as ot
from amcslam_tpu.frontend.orb import _BRIEF, _PATCH_OFF


def bench(fn, *args, n=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:30s} {dt:8.2f} ms")
    return dt


def main():
    H, W = 480, 640
    B = 4
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
    patch_off = jnp.asarray(_PATCH_OFF, jnp.int32)
    brief = jnp.asarray(_BRIEF, jnp.int32)
    budget = 215
    print(f"device={jax.devices()[0]}  B={B} {H}x{W}")

    # full extractor
    full = ot.build_orb_tpu(H, W, n_features=800)
    bench(full, imgs, name="full extract_batch (8 lvl)")

    # stage programs (level-0 size, vmapped over batch)
    f_masks = jax.jit(jax.vmap(lambda im: ot._fast_masks_pair(im, 20, 7)))
    bench(f_masks, imgs, name="fast_masks_pair (both th)")

    def nms_cells(im):
        ok, _, score = ot._fast_masks_pair(im, 20, 7)
        nms = ot._nms3_jnp(jnp.where(ok, score, 0))
        cand = ot._cell_retry(ok & nms, ok & nms, H, W)
        s = jnp.where(cand, score, 0)
        return s + jnp.where(ot._cell_best_mask(s, H, W), 1 << 20, 0)

    prio = jax.jit(jax.vmap(nms_cells))(imgs)
    jax.block_until_ready(prio)
    f_nms = jax.jit(jax.vmap(nms_cells))
    bench(f_nms, imgs, name="fast+nms+cells (fused)")

    f_topk = jax.jit(jax.vmap(lambda p: jax.lax.top_k(p.reshape(-1), budget)))
    bench(f_topk, prio, name=f"top_k({budget}) over HxW")

    f_argmax = jax.jit(jax.vmap(
        lambda p: jax.lax.approx_max_k(p.reshape(-1).astype(jnp.float32),
                                       budget)))
    bench(f_argmax, prio, name=f"approx_max_k({budget})")

    vals, flat = jax.jit(jax.vmap(
        lambda p: jax.lax.top_k(p.reshape(-1), budget)))(imgs.astype(jnp.int32).reshape(B, -1))
    ys = (flat // W).astype(jnp.int32)
    xs = (flat % W).astype(jnp.int32)

    def orient(im, ys, xs):
        I = im.astype(jnp.float32)
        py = jnp.clip(ys[:, None] + patch_off[None, :, 0], 0, H - 1)
        px = jnp.clip(xs[:, None] + patch_off[None, :, 1], 0, W - 1)
        v = I[py, px]
        m01 = jnp.sum(v * patch_off[None, :, 0], axis=1)
        m10 = jnp.sum(v * patch_off[None, :, 1], axis=1)
        return jnp.arctan2(m01, m10)

    f_orient = jax.jit(jax.vmap(orient))
    ang = f_orient(imgs, ys, xs)
    bench(f_orient, imgs, ys, xs, name="orientation gathers")

    f_blur = jax.jit(jax.vmap(ot._gaussian_blur7_jnp))
    blur = f_blur(imgs)
    bench(f_blur, imgs, name="gaussian blur7")

    def briefsamp(blur, ys, xs, ang):
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        bx1, by1, bx2, by2 = brief[:, 0], brief[:, 1], brief[:, 2], brief[:, 3]

        def samp(bx, by):
            rx = jnp.round(ca[:, None] * bx[None, :] - sa[:, None] * by[None, :])
            ry = jnp.round(sa[:, None] * bx[None, :] + ca[:, None] * by[None, :])
            gx = jnp.clip(xs[:, None] + rx.astype(jnp.int32), 0, W - 1)
            gy = jnp.clip(ys[:, None] + ry.astype(jnp.int32), 0, H - 1)
            return blur[gy, gx]

        bits = (samp(bx1, by1) < samp(bx2, by2)).astype(jnp.int32)
        pack_w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
        return jnp.einsum("kab,b->ka", bits.reshape(budget, 32, 8), pack_w)

    f_brief = jax.jit(jax.vmap(briefsamp))
    bench(f_brief, blur, ys, xs, ang, name="BRIEF rotate+gather+pack")

    f_resize = jax.jit(jax.vmap(lambda im: ot._resize_bilinear_jnp(im, 400, 533)))
    bench(f_resize, imgs, name="bilinear resize lvl1")


if __name__ == "__main__":
    main()
