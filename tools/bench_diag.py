"""Diagnose the round-1 bench pass-to-pass degradation (VERDICT weak #2).

BENCH_r01.json recorded 99.5 -> 70.2 -> 46.6 faces/s over three identical
passes — monotonic, not noise-shaped.  This script separates the two
candidate causes:

* environmental (time-shared chip throttling the longer we hold it), vs.
* in-process (leak / backlog / thread growth in the pipeline).

Method: run N identical process_dir passes over the same directory and,
between passes, (a) run a fixed device-only microbench (the already-compiled
fused program on a cached input — pure device+fetch time, no host pipeline),
(b) record RSS, thread count, live jax buffer count, and per-stage stats
deltas.  If the microbench degrades in step with e2e, it's the environment;
if e2e degrades while the microbench holds, it's us.

Usage: python tools/bench_diag.py [--passes 6] [--images 128]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import bench  # reuses dataset + cropper construction


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return -1.0


def live_buffers() -> int:
    import jax

    try:
        return len(jax.live_arrays())
    except Exception:
        return -1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--sleep", type=float, default=0.0,
                    help="idle seconds between passes (tests quantum-throttle theory)")
    ap.add_argument("--fresh-cropper", action="store_true",
                    help="build a new Cropper every pass")
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    print(f"device={dev}", file=sys.stderr)

    cropper = bench.build_cropper(str(dev.platform))
    data_dir = bench.make_dataset(args.images)
    out_dir = data_dir + "_out"

    # warmup/compile
    warm = bench.make_dataset(bench.BATCH)
    cropper.process_dir(warm, warm + "_out", desc=None)

    # fixed-work microbench: the already-compiled fused program on a cached
    # input (device compute + one fetch; no file IO, no thread pool)
    micro = None
    if cropper._fused is not None:
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, (bench.BATCH,) + bench.SRC_HW + (3,), np.uint8)
        cropper._fused.process(x, cropper.resize_size)  # ensure compiled

        def micro():
            t0 = time.perf_counter()
            for _ in range(4):
                cropper._fused.process(x, cropper.resize_size)
            return (time.perf_counter() - t0) / 4 * 1e3

    hdr = "pass  faces/s   micro_ms   rss_mb  threads  bufs  " \
          "read_s    det+crop_s  save_s"
    print(hdr)
    prev = {k: dict(v) for k, v in cropper.stats.as_dict().items()}
    for p in range(args.passes):
        if args.fresh_cropper and p:
            cropper = bench.build_cropper(str(dev.platform))
            cropper.process_dir(warm, warm + "_out", desc=None)
        shutil.rmtree(out_dir, ignore_errors=True)
        if args.sleep:
            time.sleep(args.sleep)
        t0 = time.perf_counter()
        cropper.process_dir(data_dir, out_dir, desc=None)
        dt = time.perf_counter() - t0
        faces = len(os.listdir(out_dir))
        m = micro() if micro else float("nan")
        cur = {k: dict(v) for k, v in cropper.stats.as_dict().items()}

        def delta(stage):
            a = cur.get(stage, {}).get("seconds", 0.0)
            b = prev.get(stage, {}).get("seconds", 0.0)
            return a - b

        print(f"{p:>4}  {faces / dt:7.1f}   {m:8.1f}   {rss_mb():6.0f}  "
              f"{threading.active_count():7d}  {live_buffers():4d}  "
              f"{delta('read'):8.2f}  {delta('detect+crop'):8.2f}  {delta('save'):8.2f}",
              flush=True)
        prev = cur

    for d in (data_dir, out_dir, warm, warm + "_out"):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
