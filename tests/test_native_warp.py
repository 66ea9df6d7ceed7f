"""Native host warp (native/fcpt_io.cpp::fcpt_warp_affine_u8).

The host-native counterpart of ops/warp.py for CPU-only runs (the
reference's pure-host configs lean on cv2.warpAffine's C++; ours is ~3x
XLA:CPU).  Must match the device warp within one intensity level on a
vanishing fraction of pixels (float-order differences at rounding
boundaries only).
"""

import numpy as np
import pytest

from face_crop_plus_tpu.ops.warp import BORDER_MODES, to_uint8, warp_affine_batch
from face_crop_plus_tpu.utils.native_io import available, warp_affine_batch_native

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable (no toolchain)"
)


def _mats(rng, f):
    base = np.array([[0.8, 0.1, 5.0], [-0.1, 0.8, 8.0]], np.float32)
    out = np.stack([base * (1.0 + 0.07 * i) for i in range(f)])
    out[..., 2] += rng.uniform(-10, 10, (f, 2)).astype(np.float32)
    return out


@pytest.mark.parametrize("mode", BORDER_MODES)
def test_native_matches_device_warp(rng, mode):
    imgs = rng.integers(0, 255, (4, 60, 80, 3), dtype=np.uint8)
    mats = _mats(rng, 6)
    idx = np.array([0, 1, 2, 3, 0, 2], np.int32)
    want = np.asarray(to_uint8(warp_affine_batch(imgs, mats, idx, (48, 40), mode)))
    got = warp_affine_batch_native(imgs, mats, idx, (48, 40), mode)
    d = np.abs(want.astype(int) - got.astype(int))
    assert d.max() <= 1
    assert (d > 0).mean() < 1e-3


@pytest.mark.parametrize("mode", ["constant", "replicate", "reflect_101"])
def test_native_matches_device_warp_windows(rng, mode):
    imgs = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
    mats = _mats(rng, 5)
    idx = np.array([0, 1, 2, 0, 1], np.int32)
    win = np.tile(np.array([[6, 4, 50, 56]], np.int32), (5, 1))
    want = np.asarray(
        to_uint8(warp_affine_batch(imgs, mats, idx, (32, 32), mode, win))
    )
    got = warp_affine_batch_native(imgs, mats, idx, (32, 32), mode, win)
    d = np.abs(want.astype(int) - got.astype(int))
    assert d.max() <= 1
    assert (d > 0).mean() < 1e-3


def test_native_empty_and_validation(rng):
    imgs = rng.integers(0, 255, (1, 8, 8, 3), dtype=np.uint8)
    out = warp_affine_batch_native(
        imgs, np.zeros((0, 2, 3), np.float32), np.zeros(0, np.int32), (4, 4)
    )
    assert out.shape == (0, 4, 4, 3)
    assert warp_affine_batch_native(imgs, _mats(rng, 1), [0], (4, 4), "nope") is None


@pytest.mark.parametrize("mode", ["constant", "reflect"])
def test_native_fixed_point_within_one_level(rng, mode):
    """exact=False (10-bit fixed-point, the cv2 arithmetic family) stays
    within one intensity level of the exact path everywhere."""
    imgs = rng.integers(0, 255, (4, 60, 80, 3), dtype=np.uint8)
    mats = _mats(rng, 6)
    idx = np.array([0, 1, 2, 3, 0, 2], np.int32)
    a = warp_affine_batch_native(imgs, mats, idx, (48, 40), mode, exact=True)
    b = warp_affine_batch_native(imgs, mats, idx, (48, 40), mode, exact=False)
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 1


def test_native_hostile_inputs_defined(rng):
    """Invalid img_idx yields a black crop; degenerate/out-of-range windows
    are sanitized instead of dividing by zero / reading out of bounds."""
    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    mats = _mats(rng, 3)
    idx = np.array([0, 5, 1], np.int32)  # 5 is out of range
    win = np.array(
        [[0, 0, 32, 32], [0, 0, 0, 0], [30, 30, 50, 50]], np.int32
    )  # zero-size and past-the-edge windows
    out = warp_affine_batch_native(imgs, mats, idx, (8, 8), "reflect", win)
    assert out is not None and out.shape == (3, 8, 8, 3)
    assert (out[1] == 0).all()


def test_native_warp_gate_pure_host(rng, monkeypatch):
    """Gate contract (r4 host-crop mode): callers of this helper always hold
    host pixel arrays, so the native warp applies whenever the host-crop
    policy is on — even with models present (`_host_crop_enabled`); it
    stands down when the policy is forced off or the crops must stay
    device-resident (`crop_source="interim"`)."""
    from types import SimpleNamespace

    from face_crop_plus_tpu import Cropper

    monkeypatch.delenv("FCPT_HOST_CROP", raising=False)
    c = Cropper(output_size=16, det_threshold=None, enh_threshold=None,
                device="cpu")
    c._device = SimpleNamespace(platform="tpu")
    imgs = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    out = c._native_warp(imgs, _mats(rng, 2), np.zeros(2, np.int32), None)
    assert out is not None and out.shape == (2, 16, 16, 3)

    # Model present + host-crop policy on (auto, native kernel available):
    # detection-mode crops are host work too (STATUS r4 #12).
    c.det_model = object()
    from face_crop_plus_tpu.utils.native_io import native_warp_available

    if native_warp_available(c.padding):
        out = c._native_warp(imgs, _mats(rng, 2), np.zeros(2, np.int32), None)
        assert out is not None and out.shape == (2, 16, 16, 3)

    # Forced off -> device warp (None) for model pipelines on accelerators.
    monkeypatch.setenv("FCPT_HOST_CROP", "0")
    assert c._native_warp(imgs, _mats(rng, 2), np.zeros(2, np.int32), None) is None
    monkeypatch.delenv("FCPT_HOST_CROP")

    # Device-resident interim -> device warp regardless of the policy.
    c.crop_source = "interim"
    assert c._native_warp(imgs, _mats(rng, 2), np.zeros(2, np.int32), None) is None
    c.crop_source = "original"

    # Pure-host pipelines keep the native path even when the policy knob
    # is off (their sources never touch the device at all).
    c.det_model = None
    monkeypatch.setenv("FCPT_HOST_CROP", "0")
    out = c._native_warp(imgs, _mats(rng, 2), np.zeros(2, np.int32), None)
    assert out is not None


def test_cropper_native_vs_xla_host_path(tmp_path, rng, monkeypatch):
    """Landmark-mode Cropper on CPU: native warp == XLA warp within 1 level."""
    from face_crop_plus_tpu import Cropper
    from face_crop_plus_tpu.utils.io import imread_rgb, imwrite

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        imwrite(str(d / f"f{i}.png"),
                rng.integers(0, 255, (60, 50, 3), dtype=np.uint8))
    lm = tmp_path / "lm.txt"
    lm.write_text("\n".join(
        f"f{i}.png 15 20 35 20 25 30 17 40 33 40" for i in range(4)))

    outs = {}
    for name, env in (("native", "1"), ("xla", "0")):
        monkeypatch.setenv("FCPT_NATIVE_WARP", env)
        out = str(tmp_path / f"out_{name}")
        c = Cropper(output_size=32, landmarks=str(lm), det_threshold=None,
                    enh_threshold=None, device="cpu")
        c.process_dir(str(d), out, desc=None)
        import os

        outs[name] = {
            f: imread_rgb(os.path.join(out, f)) for f in sorted(os.listdir(out))
        }
    assert outs["native"].keys() == outs["xla"].keys()
    for f in outs["native"]:
        dd = np.abs(outs["native"][f].astype(int) - outs["xla"][f].astype(int))
        assert dd.max() <= 2, f  # ±1 warp + JPEG/PNG re-encode headroom
