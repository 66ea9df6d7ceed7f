"""Diagnoses compile+warmup cost of the headline bench (VERDICT r2 weak #1).

Runs exactly the bench's warmup (build cropper -> process one BATCH-sized
directory), with ``jax_log_compiles`` on and a logging hook that timestamps
every XLA compilation, so the 14.6s (r1) -> 256.5s (r2) warmup regression can
be itemized: how many programs compile, how long each takes, and how much of
the wall clock is compilation vs tunnel/server cost vs host work.

Usage:
    python tools/warmup_diag.py                  # cold (fresh cache dir)
    FCPT_COMPILATION_CACHE=/tmp/x python ...     # warm rerun against a cache
"""

import json
import logging
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

EVENTS: list[tuple[float, str]] = []
T0 = time.perf_counter()


class _CompileLogHook(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        if "ompiling" in msg or "cache" in msg.lower():
            EVENTS.append((time.perf_counter() - T0, msg.split("\n")[0][:160]))


def main():
    os.environ.setdefault("JAX_LOG_COMPILES", "1")
    import jax

    hook = _CompileLogHook()
    for name in ("jax", "jax._src.interpreters.pxla", "jax._src.dispatch",
                 "jax._src.compiler", "jax._src.compilation_cache"):
        lg = logging.getLogger(name)
        lg.addHandler(hook)
        lg.setLevel(logging.DEBUG)

    durations: list[tuple[str, float]] = []
    try:
        from jax import monitoring

        def _on_event(event, duration, **kw):
            durations.append((event, duration))

        monitoring.register_event_duration_secs_listener(_on_event)
    except Exception as e:  # pragma: no cover
        print(f"monitoring hook unavailable: {e}", file=sys.stderr)

    import bench

    t0 = time.perf_counter()
    cropper = bench.build_cropper(
        "tpu" if any(d.platform == "tpu" for d in jax.devices()) else "cpu"
    )
    t_build = time.perf_counter() - t0

    warm_dir = bench.make_dataset(bench.BATCH)
    out_dir = warm_dir + "_out"
    t0 = time.perf_counter()
    cropper.process_dir(warm_dir, out_dir, desc=None)
    t_warm = time.perf_counter() - t0
    shutil.rmtree(warm_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)

    print(f"\n=== build_cropper: {t_build:.1f}s   warmup process_dir: {t_warm:.1f}s")
    print(f"=== compile log events: {len(EVENTS)}")
    for t, msg in EVENTS:
        print(f"  {t:8.1f}s  {msg}")

    agg: dict[str, tuple[int, float]] = {}
    for event, dur in durations:
        n, s = agg.get(event, (0, 0.0))
        agg[event] = (n + 1, s + dur)
    print("=== monitoring durations:")
    for event, (n, s) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {s:8.1f}s  x{n:<4d} {event}")

    print(json.dumps({
        "build_s": round(t_build, 1),
        "warmup_s": round(t_warm, 1),
        "n_compile_events": len(EVENTS),
    }))


if __name__ == "__main__":
    main()
