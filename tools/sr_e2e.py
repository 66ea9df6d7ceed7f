"""Production enhancer end-to-end timing: RRDBNet.enhance_images at 512².

Times the full jitted SR program (normalize -> trunk -> tail -> bicubic
x0.25 undo -> uint8) per trunk mode.  Output shape == input shape, so runs
chain for forced execution on the async tunneled platform.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax

from face_crop_plus_tpu.models.enhancement import RRDBNet


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    modes = (sys.argv[2].split(",") if len(sys.argv) > 2 else ["plain", "ws2d"])
    dev = jax.devices()[0]
    print(f"device={dev} size={size}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (1, size, size, 3), np.uint8)

    for mode in modes:
        m = RRDBNet(trunk_mode=mode, device=dev)
        t0 = time.perf_counter()
        y = m.enhance_images(x)
        print(f"[{mode}] compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            r = 3
            for _ in range(r):
                y = m.enhance_images(y)
            dt = (time.perf_counter() - t0) / r
            best = min(best, dt)
            print(f"[{mode}] rep {rep}: {dt * 1e3:.1f} ms/img", file=sys.stderr)
        mps = size * size / best / 1e6
        print(f"{mode}: {best * 1e3:.1f} ms/img at {size}² -> {mps:.2f} MP/s")


if __name__ == "__main__":
    main()
