"""Is the cold-process first-fetch stall per-PROCESS or per-PROGRAM?

tools/warmup_attrib.py shows a cold process pays its warmup almost
entirely in the *first host fetch* (239 s in one window, 86/20 s in the r4
driver artifacts) — dispatch returns in milliseconds and XLA compile is
seconds, so the backend defers real session establishment (and possibly
execution) to the first fetch.  This probe orders the candidates:

  1. trivial    fetch of `zeros((8,)) + 1`   (no real compute)
  2. conv       fetch of a small conv program (new program, same process)
  3. detect     first fetch of the production fused detect program

If (1) absorbs the multi-minute cost and (2)/(3) are seconds, the cost is
per-process session establishment -> a background pre-warm thread at
Cropper construction hides it.  If (3) is expensive regardless, it is
per-program server compile/load and only program-count reduction helps.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")


def t(name, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{name:<28} {dt:8.2f}s", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    t("backend_init", jax.devices)

    # 1. trivial program
    f1 = jax.jit(lambda x: x + 1.0)
    x1 = jnp.zeros((8,), jnp.float32)
    t("trivial dispatch", lambda: f1(x1))
    t("trivial FIRST FETCH", lambda: np.asarray(f1(x1)))

    # 2. small conv program (different program, same process)
    f2 = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )
    x2 = jnp.zeros((1, 64, 64, 16), jnp.bfloat16)
    w2 = jnp.zeros((3, 3, 16, 16), jnp.bfloat16)
    t("conv dispatch", lambda: f2(x2, w2))
    t("conv FIRST FETCH", lambda: np.asarray(f2(x2, w2)))

    # 3. the production detect program
    import bench

    cropper = t("cropper_init", lambda: bench.build_cropper("tpu"))
    warm = bench.make_dataset(bench.BATCH)
    t(
        "detect first process_dir",
        lambda: cropper.process_dir(warm, warm + "_out", desc=None),
    )

    import shutil

    for d in (warm, warm + "_out"):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
