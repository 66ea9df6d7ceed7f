"""Lightweight tracing/profiling for the pipeline.

The reference has no observability beyond tqdm progress bars (SURVEY §5.1);
production TPU pipelines need more: this module provides per-stage wall-time
accounting (decode / detect / enhance / crop / parse / save) and an optional
``jax.profiler`` trace context for TensorBoard-grade device profiles.

Usage::

    from face_crop_plus_tpu.utils.profiling import PipelineStats, trace

    stats = PipelineStats()
    with stats.stage("detect"):
        ...
    print(stats.report())

    with trace("/tmp/jax-trace"):           # opens in TensorBoard/XProf
        cropper.process_dir(...)
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict


class PipelineStats:
    """Thread-safe accumulated wall time and counts per pipeline stage."""

    def __init__(self):
        self._lock = threading.Lock()
        self.seconds: dict[str, float] = defaultdict(float)
        self.calls: dict[str, int] = defaultdict(int)
        self.items: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.seconds[name] += dt
                self.calls[name] += 1
                self.items[name] += items

    def report(self) -> str:
        """Human-readable per-stage table, slowest first."""
        lines = ["stage            total_s   calls   items   items/s"]
        for name, sec in sorted(self.seconds.items(), key=lambda kv: -kv[1]):
            items = self.items[name]
            rate = f"{items / sec:10.1f}" if items and sec > 0 else "         -"
            lines.append(
                f"{name:<16}{sec:9.3f}{self.calls[name]:8d}{items:8d}{rate}"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            name: {
                "seconds": self.seconds[name],
                "calls": self.calls[name],
                "items": self.items[name],
            }
            for name in self.seconds
        }


@contextlib.contextmanager
def trace(log_dir: str | None):
    """``jax.profiler.trace`` wrapper (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def host_speed_probe(reps: int = 120, _cache: dict = {}) -> float | None:
    """Fixed-work host throughput probe: codec round trips per second.

    Decodes + re-encodes one synthetic CelebA-sized JPEG ``reps`` times with
    the production codec path (utils.io imread/imwrite, i.e. the native
    libjpeg build when available).  The absolute value is meaningless; the
    *ratio* between two runs of the probe is the host-slowdown between
    them.  Host-side benchmarks capture it so a reader can separate "the
    pipeline got slower" from "the shared host was loaded" — the host
    analog of the device profile's chip-contention index (the box this
    framework is developed on is a time-shared 1-vCPU VM whose effective
    speed varies by the hour).

    Returns round trips/s, or None when the probe cannot run.  The probe
    image is cached per-process so repeated calls measure only codec work.
    """
    try:
        import tempfile

        import numpy as np

        from .io import imread_rgb, imwrite

        if "path" not in _cache:
            rng = np.random.default_rng(0)
            # Natural-image-like content (JPEG cost depends on entropy):
            # smooth low-frequency base + mild noise, CelebA-sized.
            y, x = np.mgrid[0:218, 0:178].astype(np.float32)
            base = (
                128
                + 60 * np.sin(x / 23.0)[..., None]
                + 50 * np.cos(y / 31.0)[..., None]
                + rng.normal(0, 12, (218, 178, 3))
            )
            img = np.clip(base, 0, 255).astype(np.uint8)
            path = os.path.join(
                tempfile.gettempdir(), "fcpt_host_probe.jpg"
            )
            imwrite(path, img)
            _cache["path"] = path
        path = _cache["path"]
        out = path + ".rt.jpg"
        imwrite(out, imread_rgb(path))  # warm
        rates = []
        for _ in range(3):  # median of 3 groups rejects scheduler blips
            t0 = time.perf_counter()
            for _ in range(reps):
                imwrite(out, imread_rgb(path))
            dt = time.perf_counter() - t0
            if dt > 0:
                rates.append(reps / dt)
        try:
            os.remove(out)
        except OSError:
            pass
        return float(np.median(rates)) if rates else None
    except Exception:  # pragma: no cover - environment-dependent
        return None
