"""Warp gather-formulation lever sweep (round 4).

Chained-dependency timing of the fused pipeline (tools/detect_traffic.py
discipline — only a host fetch is a true barrier here, and identical
unread dispatches are deduped/skipped by the tunneled runtime, see
bench.device_profile) showed the production program splits ~51 ms
detect + ~80 ms warp per 16-image batch at 256² crops: the window-gather
warp (ops/warp.py) is the single biggest device cost, bigger than the
whole ResNet-50 at 1024².

XLA lowers the (1,2,2,C) per-pixel window gather to a slow element-wise
path (~80 ns/output-pixel), so this tool measures alternative
formulations of the same bilinear sample before we ship one:

* ``window``     production: one gather of (1,2,2,C) windows per pixel.
* ``window_f32`` same, but the uint8 source is cast to f32 first (dtype
                 effect on gather lowering).
* ``neighbor4``  four advanced-indexing gathers (one per bilinear tap).
* ``flat4``      four 1-D ``jnp.take`` embedding-style lookups from the
                 (N·H·W, C) flattened source (linear indices).
* ``flat1``      one 1-D ``jnp.take`` of 2×2-pixel *pairs*: gathers rows
                 of a (N·H·W, 2C) view where each row holds pixels
                 (y, x) and (y, x+1), so two takes (y0/y1) fetch all four
                 taps — halves the gather count per tap pair.
* ``mapcoords``  ``jax.scipy.ndimage.map_coordinates`` vmapped per face
                 (order=1), the "idiomatic" spelling.

Each variant is timed chained (dep scalar feeds the next dispatch) and
checked against the production f32 output (max |Δ| in intensity levels).

Usage:  python tools/warp_levers.py [variants...]   (default: all)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax
import jax.numpy as jnp
from functools import partial


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 16          # images per batch (bench BATCH)
SRC_HW = (218, 178)
OUT = (256, 256)  # (W, H)


def make_inputs(dev):
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (N,) + SRC_HW + (3,), np.uint8)), dev
    )
    # Similarity-ish transforms with rotation, CelebA-scale crops.
    mats = []
    for i in range(N):
        ang = rng.uniform(-0.3, 0.3)
        s = rng.uniform(1.2, 2.2)
        c, sn = s * np.cos(ang), s * np.sin(ang)
        tx, ty = rng.uniform(-40, -10), rng.uniform(-60, -20)
        mats.append([[c, -sn, tx], [sn, c, ty]])
    mats = jnp.asarray(np.asarray(mats, np.float32))
    idx = jnp.arange(N, dtype=jnp.int32)
    return imgs, mats, idx


# ---------------------------------------------------------------------------
# Shared geometry (mirrors ops/warp.py constant-mode fast path)
# ---------------------------------------------------------------------------


def _coords(mats):
    from face_crop_plus_tpu.ops.transform import invert_affine
    from face_crop_plus_tpu.ops.warp import _source_coords

    inv = invert_affine(mats)
    sx, sy = _source_coords(inv, OUT)  # (F, Ho, Wo)
    return sx, sy


def _taps(sx, sy, h, w):
    """x0/y0 int taps + fractions + inside mask (constant border)."""
    inside = (sx > -1.0) & (sx < w) & (sy > -1.0) & (sy < h)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = sx - x0
    fy = sy - y0
    return x0, y0, fx, fy, inside


# ---------------------------------------------------------------------------
# Variants: (imgs u8 (N,H,W,3), mats, idx) -> f32 crops (N, Ho, Wo, 3)
# ---------------------------------------------------------------------------


def v_window(imgs, mats, idx):
    from face_crop_plus_tpu.ops.warp import warp_affine_batch

    return warp_affine_batch(imgs, mats, idx, OUT, "constant")


def v_window_f32(imgs, mats, idx):
    from face_crop_plus_tpu.ops.warp import warp_affine_batch

    return warp_affine_batch(imgs.astype(jnp.float32), mats, idx, OUT, "constant")


def _neighbor_weights(fx, fy, inside):
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    m = inside.astype(jnp.float32)
    return [wk * m for wk in (w00, w01, w10, w11)]


def v_neighbor4(imgs, mats, idx):
    n, h, w, c = imgs.shape
    sx, sy = _coords(mats)
    x0, y0, fx, fy, inside = _taps(sx, sy, h, w)
    f, ho, wo = sx.shape
    bidx = jnp.broadcast_to(idx[:, None, None], (f, ho, wo))
    # 1-pixel zero ring (same trick as production): clamp+offset indices.
    src = jnp.pad(imgs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ws = _neighbor_weights(fx, fy, inside)
    out = jnp.zeros((f, ho, wo, c), jnp.float32)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            ym = jnp.clip(y0 + dy + 1, 0, h + 1)
            xm = jnp.clip(x0 + dx + 1, 0, w + 1)
            val = src[bidx, ym, xm].astype(jnp.float32)
            out = out + val * ws[k][..., None]
            k += 1
    return out


def v_flat4(imgs, mats, idx):
    n, h, w, c = imgs.shape
    sx, sy = _coords(mats)
    x0, y0, fx, fy, inside = _taps(sx, sy, h, w)
    f, ho, wo = sx.shape
    src = jnp.pad(imgs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2
    flat = src.reshape(n * hp * wp, c)
    base = idx[:, None, None] * (hp * wp)
    ws = _neighbor_weights(fx, fy, inside)
    out = jnp.zeros((f, ho, wo, c), jnp.float32)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            ym = jnp.clip(y0 + dy + 1, 0, hp - 1)
            xm = jnp.clip(x0 + dx + 1, 0, wp - 1)
            lin = base + ym * wp + xm
            val = jnp.take(flat, lin.reshape(-1), axis=0).reshape(f, ho, wo, c)
            out = out + val.astype(jnp.float32) * ws[k][..., None]
            k += 1
    return out


def v_flat1(imgs, mats, idx):
    """Two 1-D takes of (2C,) x-pixel-pairs (rows y0 and y0+1)."""
    n, h, w, c = imgs.shape
    sx, sy = _coords(mats)
    x0, y0, fx, fy, inside = _taps(sx, sy, h, w)
    f, ho, wo = sx.shape
    src = jnp.pad(imgs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2
    # pair view: row i of (N*hp*(wp-1), 2C) holds pixels (y,x),(y,x+1)
    flat = src.reshape(n * hp * wp * c)
    pairs = jax.vmap(lambda s: jax.lax.dynamic_slice(flat, (s,), (1,)))  # unused
    # Build pair table via as_strided-like reshape: windows of 2 pixels.
    byrow = src.reshape(n * hp, wp * c)
    pair_tab = jnp.concatenate([byrow[:, : (wp - 1) * c].reshape(n * hp, wp - 1, c),
                                byrow[:, c:].reshape(n * hp, wp - 1, c)], axis=-1)
    pair_tab = pair_tab.reshape(n * hp * (wp - 1), 2 * c)
    xm = jnp.clip(x0 + 1, 0, wp - 2)
    ws = _neighbor_weights(fx, fy, inside)
    out = jnp.zeros((f, ho, wo, c), jnp.float32)
    for dy, (wl, wr) in zip((0, 1), ((ws[0], ws[1]), (ws[2], ws[3]))):
        ym = jnp.clip(y0 + dy + 1, 0, hp - 1)
        lin = (idx[:, None, None] * hp + ym) * (wp - 1) + xm
        val = jnp.take(pair_tab, lin.reshape(-1), axis=0).reshape(f, ho, wo, 2 * c)
        val = val.astype(jnp.float32)
        out = out + val[..., :c] * wl[..., None] + val[..., c:] * wr[..., None]
    return out


def v_mapcoords(imgs, mats, idx):
    from jax.scipy.ndimage import map_coordinates

    n, h, w, c = imgs.shape
    sx, sy = _coords(mats)
    src = imgs.astype(jnp.float32)

    def one(img, sxf, syf):
        def chan(ch):
            return map_coordinates(ch, [syf, sxf], order=1, mode="constant")

        return jnp.stack([chan(img[..., k]) for k in range(c)], axis=-1)

    return jax.vmap(one)(src[idx], sx, sy)


VARIANTS = {
    "window": v_window,
    "window_f32": v_window_f32,
    "neighbor4": v_neighbor4,
    "flat4": v_flat4,
    "flat1": v_flat1,
    "mapcoords": v_mapcoords,
}


def main():
    dev = jax.devices()[0]
    imgs, mats, idx = make_inputs(dev)
    names = sys.argv[1:] or list(VARIANTS)

    ref = None
    results = {}
    for name in names:
        fn = VARIANTS[name]

        @partial(jax.jit, static_argnames=())
        def step(imgs, mats, idx, dep, fn=fn):
            out = fn(imgs, mats, idx)
            s = out.sum() + dep
            return out, (s % 2).astype(jnp.float32)

        try:
            out, dep = step(imgs, mats, idx, jnp.float32(0))
            outh = np.asarray(out)
        except Exception as e:
            log(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        if ref is None:
            ref = outh
            err = 0.0
        else:
            err = float(np.abs(outh - ref).max())
        k = 20
        t0 = time.perf_counter()
        for _ in range(k):
            out, dep = step(imgs, mats, idx, dep)
        float(np.asarray(dep))
        ms = (time.perf_counter() - t0) / k * 1e3
        results[name] = (ms, err)
        log(f"{name:14s} {ms:8.2f} ms/batch   max|d|={err:.4f}")

    log("\nlever table (16 faces, 256^2 crops, 218x178 src, constant border):")
    base = results.get("window", (None,))[0]
    for nm, (ms, err) in results.items():
        rel = f"{base / ms:5.2f}x" if base else ""
        log(f"  {nm:14s} {ms:8.2f} ms/batch  {rel}  max|d|={err:.3f}")


if __name__ == "__main__":
    main()
