"""Host-crop execution mode (round 4).

Measured on a v5e (tools/warp_levers.py), the device warp's per-pixel
window gather costs more than the entire 1024² detect program, while the
native AVX2 host warp does the same crops ~20x faster — so when nothing
downstream consumes device-resident crops, the Cropper dispatches a
detect-only program and warps on the host (``Cropper._host_crop_enabled``,
``FusedPipeline.detect_only``).  The reference also warps on the host
(cropper.py:514-547); ours is batched + threaded.

These tests pin the mode's semantics: output-tree parity with the device
warp within the native kernel's documented one-level band, identical
landmark/index selection, the eligibility gates, and the env override.
"""

import os

import numpy as np
import pytest

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imwrite
from face_crop_plus_tpu.utils.native_io import native_warp_available

pytestmark = pytest.mark.skipif(
    not native_warp_available(),
    reason="native warp kernel unavailable (no toolchain)",
)


def _make_dir(tmp_path, rng, n=6, hw=(64, 60)):
    d = tmp_path / "src"
    d.mkdir()
    for i in range(n):
        imwrite(str(d / f"{i}.png"), rng.integers(0, 255, hw + (3,), np.uint8))
    return str(d)


def _cropper(**kw):
    kw.setdefault("output_size", 32)
    kw.setdefault("resize_size", 64)
    kw.setdefault("det_threshold", 0.6)
    kw.setdefault("batch_size", 4)
    kw.setdefault("device", "cpu")
    c = Cropper(**kw)
    # Random weights leave no score above threshold; vis=-1 keeps every
    # anchor as a candidate (the e2e test fixture convention).
    c.det_model.vis_threshold = -1.0
    c.det_model.auto_grow = False
    c.det_model._cap_warned = True
    return c


def _read_tree(out_dir):
    import cv2

    out = {}
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, out_dir)] = cv2.imread(p)
    return out


@pytest.mark.parametrize("strategy", ["largest", "all"])
def test_host_crop_tree_matches_device_warp(tmp_path, rng, monkeypatch, strategy):
    src = _make_dir(tmp_path, rng)
    trees = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("FCPT_HOST_CROP", flag)
        out = str(tmp_path / f"out{flag}")
        _cropper(strategy=strategy).process_dir(src, out, desc=None)
        trees[flag] = _read_tree(out)
    assert set(trees["1"]) == set(trees["0"]) and trees["1"]
    for name, img in trees["1"].items():
        d = np.abs(img.astype(int) - trees["0"][name].astype(int))
        # native fixed-point sampling: within one intensity level of the
        # exact device warp, on a vanishing fraction of pixels
        assert d.max() <= 1, name
        assert (d > 0).mean() < 2e-3, name


def test_detect_only_matches_fused_selection(rng, monkeypatch):
    """detect_only returns exactly the faces the fused program selects."""
    monkeypatch.setenv("FCPT_HOST_CROP", "0")
    c = _cropper(strategy="largest")
    batch = rng.integers(0, 255, (4, 64, 60, 3), np.uint8)
    lm, idx = c._fused.detect_only(batch, c.resize_size)
    _crops, lm2, idx2 = c._fused.process(batch, c.resize_size)[:3]
    np.testing.assert_array_equal(idx, idx2)
    np.testing.assert_allclose(lm, lm2, atol=1e-5)


def test_detect_only_valid_n_drops_padding_rows(rng):
    c = _cropper(strategy="largest")
    batch = rng.integers(0, 255, (4, 64, 60, 3), np.uint8)
    lm, idx = c._fused.detect_only(batch, c.resize_size, valid_n=2)
    assert (idx < 2).all()


def test_host_crop_gates(monkeypatch):
    """Eligibility: env override, mesh and crop_source gates."""
    c = _cropper()
    monkeypatch.setenv("FCPT_HOST_CROP", "0")
    assert not c._host_crop_enabled()
    monkeypatch.setenv("FCPT_HOST_CROP", "1")
    assert c._host_crop_enabled()
    monkeypatch.setenv("FCPT_HOST_CROP", "auto")
    assert c._host_crop_enabled() == native_warp_available(c.padding)

    ci = _cropper(crop_source="interim")
    monkeypatch.setenv("FCPT_HOST_CROP", "1")
    assert not ci._host_crop_enabled()


def test_host_crop_composes_with_packed_uploads(tmp_path, rng, monkeypatch):
    """Packed 4:2:0 sources keep the halved upload under host-crop.

    The host warps the numpy-twin reconstruction of the same stored
    planes the device detects on, so the tree must match the packed
    device-warp path within the native kernel's band (the twin is
    bit-identical to the device reconstruction).
    """
    from face_crop_plus_tpu.utils.native_io import available

    if not available():
        pytest.skip("native decoder unavailable")
    d = tmp_path / "src"
    d.mkdir()
    for i in range(6):
        # smooth gradients survive 4:2:0 packing (plain JPEG writer)
        base = np.zeros((64, 60, 3), np.uint8)
        base[..., 0] = np.linspace(0, 255, 60, dtype=np.uint8)[None, :]
        base[..., 1] = np.linspace(0, 255, 64, dtype=np.uint8)[:, None]
        base[..., 2] = (i * 37) % 256
        imwrite(str(d / f"{i}.jpg"), base)
    monkeypatch.setenv("FCPT_PACK_UPLOAD", "1")
    trees = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("FCPT_HOST_CROP", flag)
        out = str(tmp_path / f"outpk{flag}")
        c = _cropper()
        c.process_dir(str(d), out, desc=None)
        trees[flag] = _read_tree(out)
    assert set(trees["1"]) == set(trees["0"]) and trees["1"]
    for name, img in trees["1"].items():
        d_ = np.abs(img.astype(int) - trees["0"][name].astype(int))
        assert d_.max() <= 2, name  # warp band + JPEG re-encode rounding


def test_process_images_host_crop_parity(rng, monkeypatch):
    """The in-memory serving API takes the host-crop path too."""
    imgs = [rng.integers(0, 255, (64, 60, 3), np.uint8) for _ in range(4)]
    out = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("FCPT_HOST_CROP", flag)
        crops, idx, _groups = _cropper(strategy="largest").process_images(imgs)
        out[flag] = (crops, idx)
    np.testing.assert_array_equal(out["1"][1], out["0"][1])
    d = np.abs(out["1"][0].astype(int) - out["0"][0].astype(int))
    assert d.max() <= 1


def test_host_crop_with_parser_multigroup(tmp_path, rng, monkeypatch):
    """Parser without device handoff consumes host crops transparently."""
    src = _make_dir(tmp_path, rng, n=4)
    trees = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("FCPT_HOST_CROP", flag)
        out = str(tmp_path / f"outp{flag}")
        c = _cropper(attr_groups={"g": [2]}, mask_groups={"m": [2]})
        # two shape groups force the non-handoff parse path
        c.process_dir(src, out, desc=None)
        trees[flag] = set(_read_tree(out))
    assert trees["1"] == trees["0"]
