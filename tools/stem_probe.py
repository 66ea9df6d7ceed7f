"""Micro-probe: ResNet stem conv1 execution alternatives on TPU.

The stem (7x7/2 conv on 3 channels + maxpool) measures ~0.55 ms/img of the
3.2 ms/img detect program at <10 TF/s — XLA's TPU conv emitter handles
low-input-channel convolutions poorly.  Variants, all mathematically exact:

* plain        — 7x7 stride-2 conv on (1024, 1024, 3), as the reference.
* s2d2         — space-to-depth x2 -> 4x4 stride-1 conv on 12 channels.
* s2d4         — space-to-depth x4 -> 2x2 stride-1 conv on 48 channels,
                 output in s2d2 phase layout (each s2d4 cell yields a 2x2
                 block of stride-2 output pixels); maxpool runs as a 9-way
                 shifted max in phase space, emitting the standard
                 (256, 256, 64) layout layer1 expects.
* im2col       — explicit patch extraction + one big matmul.

Each timed with the chained-dep discipline, including bn+relu+maxpool so
fusion effects are realistic; reports ms/img and exactness vs plain (f32).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N, H, W = 8, 1024, 1024


def bn_relu_pool(y, scale, bias):
    y = jnp.maximum(y * scale + bias, 0)
    return lax.reduce_window(
        y, -jnp.inf, lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def make_plain(w, scale, bias):
    def f(x, dep):
        x = x + dep
        y = lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        z = bn_relu_pool(y, scale, bias)
        return z, (z.astype(jnp.float32).sum() % 2).astype(x.dtype)

    return jax.jit(f)


def make_s2d2(w, scale, bias):
    from face_crop_plus_tpu.ops.s2d import space_to_depth, stem_s2d_weight

    def f(x, dep):
        x = x + dep
        ww = stem_s2d_weight(w).astype(x.dtype)
        y = lax.conv_general_dilated(
            space_to_depth(x), ww, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        z = bn_relu_pool(y, scale, bias)
        return z, (z.astype(jnp.float32).sum() % 2).astype(x.dtype)

    return jax.jit(f)


def stem_ws2d_out_weight(w):
    """(7,7,3,64) stem -> (4,3,24,128) kernel: s2d2 input with W-blocks
    paired (channels b*12+c), output in W-s2d layout (channels o*2+so).

    y'[i, j, o*2+so] = y_s2d2[i, 2j+so, o]; the s2d2 conv reads xs2d block
    B = 2j + so + kx - 2 (pad (2,1)), which in pair coordinates is
    P = j + Q, sub-block b with (Q, b) = divmod(so + kx - 2, 2); pair
    padding (1, 1).  Pair -1 = original columns -4..-1 (all structural
    zeros or real pad), pair 256 = columns 1024..1027 (ditto) — exact for
    W % 4 == 0.  Rationale: 64 output channels fill only half the 128
    MXU/vreg lanes; emitting the W-s2d layout doubles output lanes at
    identical FLOPs.
    """
    from face_crop_plus_tpu.ops.s2d import stem_s2d_weight

    w2 = np.asarray(stem_s2d_weight(w))  # (4, 4, 12, 64)
    ci, co = w2.shape[2], w2.shape[3]
    out = np.zeros((4, 3, 2 * ci, 2 * co), np.float32)
    for so in (0, 1):
        for kx in range(4):
            q, b = divmod(so + kx - 2, 2)
            out[:, q + 1, b * ci : (b + 1) * ci, so::2] += w2[:, kx]
    return jnp.asarray(out)


def make_ws2d_out(w, scale, bias):
    from face_crop_plus_tpu.ops.s2d import depth_to_space_w, space_to_depth

    ww0 = stem_ws2d_out_weight(np.asarray(w, np.float32))  # host-side, once

    def f(x, dep):
        x = x + dep
        ww = ww0.astype(x.dtype)
        xs = space_to_depth(x)  # (N, 512, 512, 12)
        n, h2, w2_, c = xs.shape
        x2 = xs.reshape(n, h2, w2_ // 2, 2 * c)  # pair W-blocks: b*12+c
        y = lax.conv_general_dilated(
            x2, ww, (1, 1), ((2, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (N, 512, 256, 128), o*2+so
        scale2 = jnp.repeat(scale, 2)
        bias2 = jnp.repeat(bias, 2)
        y = jnp.maximum(y * scale2 + bias2, 0)
        z = depth_to_space_w(y)  # (N, 512, 512, 64)
        z = lax.reduce_window(
            z, -jnp.inf, lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        return z, (z.astype(jnp.float32).sum() % 2).astype(x.dtype)

    return jax.jit(f)


def stem_s2d4_weight(w):
    """(7,7,3,64) -> (2,2,48,256): s2d4 input, s2d2-phase output channels.

    Output pixel (2m+p, 2n+q), p,q in {0,1}: row 2(2m+p)+dy = 4m + (2p+dy).
    With 2p+dy in [-3, 5] = 4*e + a (e in {-1,0,1 -> but 2x2 kernel needs
    e in {0,1} after pad 1}, a in [0,4)): kernel tap k=e+1 in {0,1}, sub-row
    a.  W4[k, kx, (a*4+b)*3+c -> s2d4 interleave c*16+a*4+b, p*2*64+q*64+o?]
    — we emit output channel o4 = o*4 + p*2 + q to match the
    space_to_depth interleave (c*4 + dr*2 + dc), so the pool's phase
    arithmetic can use the same helper layout.
    """
    co = w.shape[-1]
    out = np.zeros((3, 3, 48, 4 * co), np.float32)
    w_np = np.asarray(w, np.float32)
    for p in (0, 1):
        for q in (0, 1):
            for dy in range(-3, 4):
                r = 2 * p + dy + 4  # in [1, 9]; block shift e = r//4 - 1
                k, a = divmod(r, 4)
                for dx in range(-3, 4):
                    s = 2 * q + dx + 4
                    kx, b = divmod(s, 4)
                    for c in range(3):
                        ci = c * 16 + a * 4 + b  # s2d4 interleave (c*16 + dr*4 + dc)
                        out[k, kx, ci, np.arange(co) * 4 + p * 2 + q] = w_np[
                            dy + 3, dx + 3, c
                        ]
    return jnp.asarray(out)


def space_to_depth4(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 4, 4, w // 4, 4, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (n, i, j, c, dr, dc)
    return x.reshape(n, h // 4, w // 4, 16 * c)


def make_s2d4(w, scale, bias):
    def f(x, dep):
        x = x + dep
        w4 = stem_s2d4_weight(w).astype(x.dtype)
        x4 = space_to_depth4(x)  # (N, 256, 256, 48)
        # pad: row taps k in {0,1,2} with r = 4k + a = 2p+dy+4, block shift
        # e = k - 1 in {-1, 0, 1} -> pad 1 both sides, kernel 3x3.
        y = lax.conv_general_dilated(
            x4, w4, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (N, 256, 256, 256): o4 = o*4 + p*2 + q
        n, hh, ww_, _ = y.shape
        co = 64
        scale4 = jnp.repeat(scale, 4)
        bias4 = jnp.repeat(bias, 4)
        y = jnp.maximum(y * scale4 + bias4, 0)
        # maxpool 3x3/2 in phase space: pooled[m, n] covers conv rows
        # 2m-1..2m+1 = phases (m-1, p=1), (m, p=0), (m, p=1).
        yr = y.reshape(n, hh, ww_, co, 2, 2)
        rows = [
            jnp.pad(yr[:, :-1, :, :, 1, :], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)),
                    constant_values=-jnp.inf),
            yr[:, :, :, :, 0, :],
            yr[:, :, :, :, 1, :],
        ]
        zr = jnp.maximum(jnp.maximum(rows[0], rows[1]), rows[2])  # (n,256,256,64,2)
        cols = [
            jnp.pad(zr[:, :, :-1, :, 1], ((0, 0), (0, 0), (1, 0), (0, 0)),
                    constant_values=-jnp.inf),
            zr[:, :, :, :, 0],
            zr[:, :, :, :, 1],
        ]
        z = jnp.maximum(jnp.maximum(cols[0], cols[1]), cols[2])  # (n,256,256,64)
        return z, (z.astype(jnp.float32).sum() % 2).astype(x.dtype)

    return jax.jit(f)


def time_fn(name, fn, x, rounds=3, k=10):
    z, dep = fn(x, x.dtype.type(0))
    np.asarray(dep)
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(k):
            z, dep = fn(x, dep)
        np.asarray(dep)
        per.append((time.perf_counter() - t0) / k / x.shape[0] * 1e3)
    med = sorted(per)[len(per) // 2]
    log(f"{name:10s} {med:7.3f} ms/img  (rounds: {['%.3f' % p for p in per]})")
    return med, z


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.2, 64).astype(np.float32))

    dev = jax.devices()[0]
    xf = jax.device_put(
        jnp.asarray(rng.uniform(0, 255, (N, H, W, 3)).astype(np.float32)), dev
    )

    # exactness on small f32 first
    xs = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
    zp, _ = make_plain(w, scale, bias)(xs, jnp.float32(0))
    for nm, mk in (("s2d2", make_s2d2), ("s2d4", make_s2d4), ("ws2d_out", make_ws2d_out)):
        zv, _ = mk(w, scale, bias)(xs, jnp.float32(0))
        d = float(jnp.abs(zv - zp).max())
        log(f"exactness {nm}: shape {zv.shape} vs {zp.shape}  max|d| {d:.2e}")

    for dtype in (jnp.bfloat16,):
        x = xf.astype(dtype)
        wd, sd, bd = w.astype(dtype), scale.astype(dtype), bias.astype(dtype)
        log(f"\n-- dtype {dtype.__name__}, batch {N}, {H}x{W} --")
        time_fn("plain", make_plain(wd, sd, bd), x)
        time_fn("s2d2", make_s2d2(wd, sd, bd), x)
        time_fn("s2d4", make_s2d4(wd, sd, bd), x)
        time_fn("ws2d_out", make_ws2d_out(wd, sd, bd), x)
        time_fn("conv_s2d2", make_conv_only("s2d2", wd, sd, bd), x)
        time_fn("conv_ws2d", make_conv_only("ws2d", wd, sd, bd), x)




def make_conv_only(kind, w, scale, bias):
    """Times just conv(+bn+relu), no pool/transpose — isolates whether the
    ws2d-out kernel's doubled output lanes speed the conv itself."""
    from face_crop_plus_tpu.ops.s2d import space_to_depth, stem_s2d_weight

    if kind == "s2d2":
        ww0 = None

        def f(x, dep):
            x = x + dep
            ww = stem_s2d_weight(w).astype(x.dtype)
            y = lax.conv_general_dilated(
                space_to_depth(x), ww, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            y = jnp.maximum(y * scale + bias, 0)
            return y, (y.astype(jnp.float32).sum() % 2).astype(x.dtype)

    else:
        ww0 = stem_ws2d_out_weight(np.asarray(w, np.float32))

        def f(x, dep):
            x = x + dep
            xs = space_to_depth(x)
            n, h2, w2_, c = xs.shape
            x2 = xs.reshape(n, h2, w2_ // 2, 2 * c)
            y = lax.conv_general_dilated(
                x2, ww0.astype(x.dtype), (1, 1), ((2, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            y = jnp.maximum(y * jnp.repeat(scale, 2) + jnp.repeat(bias, 2), 0)
            return y, (y.astype(jnp.float32).sum() % 2).astype(x.dtype)

    return jax.jit(f)


if __name__ == "__main__":
    main()
