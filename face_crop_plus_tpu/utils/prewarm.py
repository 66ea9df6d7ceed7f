"""Background device-session pre-warm (cold-start overlap).

On a remote/tunneled accelerator (this project's dev chip is a time-shared
TPU behind a tunnel) a cold process pays a large one-time *session
establishment* cost on the first host fetch of any program output —
measured at 34–414 s across contention windows by
``tools/session_probe.py``, while every subsequent program's first fetch
is <1 s.  Dispatch and XLA compilation do **not** pay it (both complete
before establishment; ``tools/warmup_attrib.py`` measured first_dispatch
0.04 s and backend_compile 5.7 s against a 239 s first fetch in the same
process).  The cost is per-process and server-side: no user code can
remove it.

What the framework can do is **overlap** it: the moment a
:class:`~face_crop_plus_tpu.cropper.Cropper` knows its device, a daemon
thread dispatches and fetches a trivial one-op program, so weight
materialization, host JPEG decode, tracing and backend compilation all
proceed while the server establishes the session.  Cold-start wall time
becomes ``max(establishment, host init + compile)`` instead of their sum.

There is no reference counterpart (torch eager on a local GPU has no
session step) — this is pure TPU-environment debt (VERDICT r4 #2).
``FCPT_PREWARM=0`` disables.
"""

from __future__ import annotations

import atexit
import os
import threading
import time

_LOCK = threading.Lock()
_STATE: dict[str, dict] = {}  # device key -> {"thread", "seconds", "t0"}

# Set at interpreter shutdown (and testable directly): the worker polls it
# so it is never parked inside a blocking runtime call when the process
# exits.  A daemon thread stuck in the backend's blocking fetch RPC at
# teardown aborts the whole process (``terminate called after throwing …
# FATAL: exception not rethrown``, SIGABRT) — observed on pure-host runs
# that finish before establishment does.  ``copy_to_host_async`` forces
# the same server-side establishment without pinning the thread (measured:
# is_ready() flips after the 30–400 s establishment window and the next
# blocking fetch costs ~0 s), and between polls the thread sits in
# ``time.sleep``, which interpreter finalization freezes safely.
_STOP = threading.Event()
atexit.register(_STOP.set)


def _run(dev, st: dict) -> None:
    try:
        import jax
        import jax.numpy as jnp

        x = jax.device_put(jnp.arange(8, dtype=jnp.float32), dev)
        a = jax.jit(lambda v: v + 1.0)(x)
        a.copy_to_host_async()
        while not _STOP.is_set():
            if a.is_ready():
                st["seconds"] = time.perf_counter() - st["t0"]
                return
            time.sleep(0.2)
        # Interrupted by shutdown before establishment finished.
        st["seconds"] = -1.0
    except Exception:  # never let a failed pre-warm break construction
        st["seconds"] = -1.0


def start(device=None) -> None:
    """Starts the session pre-warm for ``device`` (idempotent, non-blocking).

    No-ops on the CPU backend (no session to establish), when
    ``FCPT_PREWARM=0``, or when the backend cannot initialize (the caller
    will surface that error on its own first use).
    """
    if os.environ.get("FCPT_PREWARM", "1") == "0":
        return
    try:
        import jax

        dev = device if device is not None else jax.devices()[0]
    except Exception:
        return
    if getattr(dev, "platform", "cpu") == "cpu":
        return
    key = str(dev)
    with _LOCK:
        if key in _STATE:
            return
        st: dict = {"seconds": None, "t0": time.perf_counter()}
        th = threading.Thread(
            target=_run, args=(dev, st), name="fcpt-prewarm", daemon=True
        )
        st["thread"] = th
        _STATE[key] = st
        th.start()


def establishment_seconds(timeout: float | None = 0.0) -> float | None:
    """Seconds the pre-warm fetch took, or None if unknown.

    ``timeout`` > 0 waits up to that long for an in-flight pre-warm to
    finish (useful for reporting after a warm pass, whose own fetches can
    only complete once the session exists anyway).  Returns -1.0 when the
    pre-warm errored.
    """
    with _LOCK:
        states = list(_STATE.values())
    if not states:
        return None
    st = states[0]
    th = st.get("thread")
    if th is not None and th.is_alive() and timeout:
        th.join(timeout)
    return st["seconds"]
