"""Attribute cold-process warmup into named phases (VERDICT r4 #2).

BENCH_r04.json paid 86.3 s of warmup with a *warm* persistent compile
cache (backend compile only 3.2 s); nothing in the repo measured where the
rest went.  This tool runs the exact headline-bench warm sequence in this
process and times each phase separately:

  backend_init    jax.devices() (tunnel/backend handshake)
  cropper_init    Cropper construction (weight materialization, host-side)
  first_decode    first read_images batch (includes native-lib load/build)
  trace_lower     jax trace+lower of the fused detect program (host Python)
  backend_compile .compile() (persistent-cache hit or real XLA compile)
  first_dispatch  first execution of the compiled program
  first_fetch     first host fetch of each output (fresh-shape server cost)
  warm_pass       the remaining full process_dir warm pass

Usage: python tools/warmup_attrib.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

PHASES: list[tuple[str, float]] = []


def phase(name: str, t0: float) -> None:
    dt = time.perf_counter() - t0
    PHASES.append((name, dt))
    print(f"{name:<16} {dt:7.2f}s", flush=True)


def main():
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    phase("backend_init", t0)

    import bench

    t0 = time.perf_counter()
    cropper = bench.build_cropper(str(dev.platform))
    phase("cropper_init", t0)

    warm_dir = bench.make_dataset(bench.BATCH)
    from face_crop_plus_tpu.utils.io import read_images

    t0 = time.perf_counter()
    imgs, _names = read_images(sorted(os.listdir(warm_dir)), warm_dir)
    phase("first_decode", t0)

    fp = cropper._fused
    det = fp.det
    kw = det._detect_args()
    ih, iw = bench.RESIZE[1], bench.RESIZE[0]
    batch = jnp.asarray(np.stack(imgs))
    if fp.device is not None:
        batch = jax.device_put(batch, fp.device)
    program = type(fp)._run_detect

    t0 = time.perf_counter()
    lowered = program.lower(fp, det.params, batch, ih, iw, **kw)
    phase("trace_lower", t0)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    phase("backend_compile", t0)

    t0 = time.perf_counter()
    # Dispatch through the normal jit path (compiled() arg plumbing is
    # static-arg-sensitive; the jit call reuses the cache entry just built).
    out = program(fp, det.params, batch, ih, iw, **kw)
    jax.block_until_ready(out[0])
    phase("first_dispatch", t0)

    t0 = time.perf_counter()
    fetched = [np.asarray(o) for o in out]
    phase("first_fetch", t0)
    del fetched

    t0 = time.perf_counter()
    cropper.process_dir(warm_dir, warm_dir + "_out", desc=None)
    phase("warm_pass", t0)

    total = sum(dt for _n, dt in PHASES)
    print(f"{'TOTAL':<16} {total:7.2f}s")

    import shutil

    for d in (warm_dir, warm_dir + "_out"):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
