"""Measure the detect program's device time alongside a fixed-work probe.

VERDICT r4 weak #1: the driver-captured device profile (6.95 ms/img, 33%
bw roofline) contradicts the calm-window 3.2 ms/img claim.  This tool
separates program cost from chip time-sharing: it interleaves m groups of
k chained dispatches of the production detect program with m runs of a
fixed-work matmul chain whose calm time is known, and reports min / median
and the ratio (the contention index).  On a calm chip all groups measure
alike (index ~1.0); on a time-shared chip the medians inflate while the
mins approach the true program cost.

Usage: python tools/contention_probe.py [--groups 8] [--chain 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--chain", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device={dev}", file=sys.stderr)

    cropper = bench.build_cropper(str(dev.platform))
    fp = cropper._fused
    det = fp.det
    kw = det._detect_args()
    ih, iw = bench.RESIZE[1], bench.RESIZE[0]
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (bench.BATCH,) + bench.SRC_HW + (3,), np.uint8))
    if fp.device is not None:
        imgs = jax.device_put(imgs, fp.device)

    program = type(fp)._run_detect

    @jax.jit
    def _chain_dep(images, dep):
        return images + dep

    def run(images):
        out = program(fp, det.params, images, ih, iw, **kw)
        return (out[2].sum() % 2).astype(jnp.uint8)

    # Fixed-work probe: a chained 1024^3 bf16 matmul loop (known FLOPs,
    # compute-bound, ~2.1 GF/step -> ~tens of us/step on a calm v5e).
    K = 2048
    a = jnp.asarray(rng.standard_normal((K, K)), jnp.bfloat16)

    @jax.jit
    def probe_fn(x):
        for _ in range(8):
            x = x @ a
        return x

    x0 = jnp.asarray(rng.standard_normal((128, K)), jnp.bfloat16)

    # warm both
    dep = run(imgs)
    np.asarray(dep)
    px = probe_fn(x0)
    np.asarray(px)

    probe_flops = 8 * 2 * 128 * K * K

    prog_ms, probe_ms = [], []
    for g in range(args.groups):
        t0 = time.perf_counter()
        for _ in range(args.chain):
            dep = run(_chain_dep(imgs, dep))
        np.asarray(dep)
        prog_ms.append((time.perf_counter() - t0) / args.chain * 1e3)

        t0 = time.perf_counter()
        px = x0
        for _ in range(args.chain):
            px = probe_fn(px)
        np.asarray(px[0, 0])
        probe_ms.append((time.perf_counter() - t0) / args.chain * 1e3)
        print(f"group {g}: prog {prog_ms[-1]:.1f} ms/batch  probe {probe_ms[-1]:.2f} ms "
              f"({probe_flops / (probe_ms[-1] / 1e3) / 1e12:.0f} TF/s)", flush=True)

    def med(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    print(f"\nprogram: min {min(prog_ms):.1f}  median {med(prog_ms):.1f} ms/batch "
          f"({min(prog_ms) / bench.BATCH:.2f} / {med(prog_ms) / bench.BATCH:.2f} ms/img)")
    print(f"probe:   min {min(probe_ms):.2f}  median {med(probe_ms):.2f} ms  "
          f"contention index {med(probe_ms) / min(probe_ms):.2f}")
    print(f"program contention index {med(prog_ms) / min(prog_ms):.2f}")


if __name__ == "__main__":
    main()
