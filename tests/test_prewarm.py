"""Unit tests for the device-session pre-warm (utils/prewarm.py).

The real effect (overlapping a remote backend's per-process session
establishment) only shows on tunneled accelerators; these tests pin the
*contract*: CPU no-op, env kill-switch, idempotency, the
never-break-construction guarantee when the fetch fails, and — the part
that matters for process safety — that the worker polls an async copy
instead of parking in a blocking runtime call, so the shutdown event
interrupts it promptly (a daemon thread stuck in a blocking fetch RPC at
interpreter exit SIGABRTs the process; reproduced on-chip before the
async design landed).
"""

import threading
import time
from types import SimpleNamespace

import pytest

from face_crop_plus_tpu.utils import prewarm


@pytest.fixture(autouse=True)
def _isolate_state(monkeypatch):
    monkeypatch.setattr(prewarm, "_STATE", {})
    monkeypatch.setattr(prewarm, "_STOP", threading.Event())


def test_cpu_backend_is_noop():
    import jax

    prewarm.start(jax.devices("cpu")[0])
    assert prewarm._STATE == {}
    assert prewarm.establishment_seconds() is None


def test_env_kill_switch(monkeypatch):
    monkeypatch.setenv("FCPT_PREWARM", "0")
    prewarm.start(SimpleNamespace(platform="tpu"))
    assert prewarm._STATE == {}


def test_failed_prewarm_never_raises():
    fake = SimpleNamespace(platform="tpu")  # device_put will reject this
    prewarm.start(fake)
    assert len(prewarm._STATE) == 1
    deadline = time.time() + 10
    while prewarm.establishment_seconds(timeout=0.2) is None:
        assert time.time() < deadline, "prewarm thread never finished"
    assert prewarm.establishment_seconds() == -1.0


def test_idempotent_per_device():
    fake = SimpleNamespace(platform="tpu")
    prewarm.start(fake)
    th = prewarm._STATE[str(fake)]["thread"]
    prewarm.start(fake)
    assert prewarm._STATE[str(fake)]["thread"] is th
    assert len(prewarm._STATE) == 1


def test_stop_event_interrupts_inflight_prewarm(monkeypatch):
    """The worker must exit promptly on _STOP even while establishment is
    pending — i.e. it polls is_ready() rather than blocking in the runtime."""
    import jax

    class _NeverReady:
        def copy_to_host_async(self):
            pass

        def is_ready(self):
            return False

    monkeypatch.setattr(jax, "device_put", lambda x, d: _NeverReady())
    monkeypatch.setattr(jax, "jit", lambda f: (lambda v: v))
    prewarm.start(SimpleNamespace(platform="tpu"))
    st = next(iter(prewarm._STATE.values()))
    time.sleep(0.5)
    assert st["thread"].is_alive()
    assert st["seconds"] is None  # still polling, not failed
    prewarm._STOP.set()
    st["thread"].join(5.0)
    assert not st["thread"].is_alive()
    assert st["seconds"] == -1.0


def test_cropper_on_cpu_does_not_prewarm(tmp_path):
    from face_crop_plus_tpu import Cropper

    Cropper(det_threshold=None, enh_threshold=None, device="cpu")
    assert prewarm._STATE == {}


def test_pure_host_cropper_never_starts_prewarm(monkeypatch):
    """No detector/enhancer/parser → no device fetch ever happens, so the
    Cropper must not establish a session (waste + unsafe at exit)."""
    import face_crop_plus_tpu.cropper as cropper_mod
    from face_crop_plus_tpu import Cropper

    calls = []
    monkeypatch.setattr(prewarm, "start", lambda dev=None: calls.append(dev))
    Cropper(det_threshold=None, enh_threshold=None)
    assert calls == []

    Cropper(det_threshold=0.6, enh_threshold=None, device="cpu")
    assert len(calls) == 1


def test_landmark_mode_with_default_det_threshold_does_not_prewarm(
    tmp_path, monkeypatch
):
    """Precomputed landmarks suppress the detector even at the default
    det_threshold=0.6 (_init_models), so the prewarm gate must too."""
    from face_crop_plus_tpu import Cropper

    calls = []
    monkeypatch.setattr(prewarm, "start", lambda dev=None: calls.append(dev))
    lm = tmp_path / "lm.txt"
    lm.write_text("a.jpg 20 20 44 20 32 32 22 44 42 44\n")
    c = Cropper(landmarks=str(lm), enh_threshold=None)
    assert c.det_model is None
    assert calls == []
