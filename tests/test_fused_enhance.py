"""Fused enhancement path: detect→gate→SR→crop with device-resident pixels.

Round 1 forced any enhancement-active config onto the staged path (extra
host round trips).  Round 2 fuses it: the detect program also emits the
device-resident interim batch, the host routes the gated subset, SR runs on
device, and gated crops sample the enhanced pixels.  These tests pin
equivalence with the staged path and the gate's routing.
"""

import os
import warnings

import numpy as np
import pytest

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imwrite

SRC_HW = (96, 128)  # (h, w); resize_size == source dims → interim == source


def _make_cropper(enh_threshold, **overrides):
    kwargs = dict(
        output_size=32,
        resize_size=(SRC_HW[1], SRC_HW[0]),  # (w, h)
        strategy="best",
        det_threshold=-1.0,  # random weights: keep a face per image
        enh_threshold=enh_threshold,
        batch_size=3,
        device="cpu",
    )
    kwargs.update(overrides)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        c = Cropper(**kwargs)
    if c.enh_model is not None:
        c.enh_model.num_blocks = 2  # keep CPU test fast
    c.det_model.auto_grow = False
    c.det_model._cap_warned = True
    return c


@pytest.fixture()
def image_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        imwrite(str(d / f"f{i}.png"), rng.integers(0, 255, SRC_HW + (3,), dtype=np.uint8))
    return str(d)


def test_fused_pipeline_built_with_enhancer(image_dir):
    c = _make_cropper(enh_threshold=1.0)
    assert c._fused is not None and c._fused.enh is c.enh_model


def test_fused_enhanced_matches_staged(tmp_path, image_dir):
    # All images gated (threshold 1.0): crops sample SR'd interim pixels on
    # both paths; with resize_size == source dims the interim batches are
    # bit-identical, so outputs must agree to rounding.
    staged = _make_cropper(1.0, max_fused_shapes=0, output_format="png")
    out_s = str(tmp_path / "staged")
    staged.process_dir(image_dir, out_s, desc=None)

    fused = _make_cropper(1.0, output_format="png")
    out_f = str(tmp_path / "fused")
    fused.process_dir(image_dir, out_f, desc=None)
    assert len(fused._fused_shapes) == 1  # fused path actually engaged

    names = sorted(os.listdir(out_s))
    assert names == sorted(os.listdir(out_f)) and len(names) == 3

    import cv2

    for name in names:
        a = cv2.imread(os.path.join(out_s, name))
        b = cv2.imread(os.path.join(out_f, name))
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.mean() < 1.0, f"{name}: mean {d.mean():.3f}"


def test_fused_enhancer_gate_noop_matches_plain(tmp_path, image_dir):
    # Threshold 0.0: no image's (positive) face factor can gate → SR never
    # runs; outputs must equal the enhancement-free fused pipeline's.
    enh_off = _make_cropper(None, output_format="png")
    out_off = str(tmp_path / "off")
    enh_off.process_dir(image_dir, out_off, desc=None)

    enh_noop = _make_cropper(0.0, output_format="png")
    out_noop = str(tmp_path / "noop")
    enh_noop.process_dir(image_dir, out_noop, desc=None)
    assert len(enh_noop._fused_shapes) == 1

    import cv2

    names = sorted(os.listdir(out_off))
    assert names == sorted(os.listdir(out_noop)) and len(names) == 3
    for name in names:
        a = cv2.imread(os.path.join(out_off, name))
        b = cv2.imread(os.path.join(out_noop, name))
        np.testing.assert_array_equal(a, b)


def test_fused_enhanced_serving_api(image_dir):
    from face_crop_plus_tpu.utils.io import imread_rgb

    c = _make_cropper(1.0)
    imgs = [imread_rgb(os.path.join(image_dir, f)) for f in sorted(os.listdir(image_dir))]
    # Warm the shape-admission heuristic, then serve.
    crops, idx, groups = c.process_images(imgs)
    assert crops.shape == (3, 32, 32, 3) and list(idx) == [0, 1, 2]


def test_cap_growth_sees_caps_not_interim(image_dir):
    """Regression: the enhanced fused program returns (lm, valid, caps,
    interim); the growth loop must read the (N, 2) caps diagnostic, not the
    trailing interim batch (which both mis-drove growth decisions and
    force-fetched the whole interim to host every batch)."""
    c = _make_cropper(enh_threshold=1.0)
    c.det_model.auto_grow = True
    seen = []
    orig = c.det_model.grown_args

    def recording(caps, args, n_anchors):
        seen.append(np.asarray(caps).shape)
        return orig(caps, args, n_anchors)

    c.det_model.grown_args = recording
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (3,) + SRC_HW + (3,), np.uint8)
    c._fused.process(imgs, c.resize_size)
    assert seen and all(s[-1] == 2 and len(s) == 2 for s in seen), seen


def test_staged_fallback_still_enhances(tmp_path, image_dir):
    """Images routed to the staged fallback inside a fused run (shape not
    fused-eligible) must still be enhanced — whether an image gets SR must
    not depend on batch shape composition (reference cropper.py:837-840
    always enhances gated images in detection mode)."""
    c = _make_cropper(1.0, max_fused_shapes=0, output_format="png")
    assert c._fused is not None  # fused pipeline built...
    rng = np.random.default_rng(7)
    out = str(tmp_path / "o")
    c.process_dir(image_dir, out, desc=None)
    # ...but no shape is eligible: everything went staged, and the staged
    # path ran the enhancer.
    assert not c._fused_shapes
    assert c.stats.calls.get("enhance", 0) >= 1
    assert len(os.listdir(out)) == 3


def test_fused_partial_batch_valid_n(image_dir):
    """A caller-padded batch surfaces faces only from real rows, and the
    enhanced path never super-resolves the duplicate padding rows."""
    c = _make_cropper(1.0)
    rng = np.random.default_rng(8)
    real = rng.integers(0, 255, (2,) + SRC_HW + (3,), np.uint8)
    batch = np.concatenate([real, np.repeat(real[-1:], 4, axis=0)])  # pad to 6

    calls = []
    orig = c.enh_model.enhance_device

    def counting(imgs):
        calls.append(int(imgs.shape[0]))
        return orig(imgs)

    c.enh_model.enhance_device = counting
    crops, lm, idx = c._fused.process(batch, c.resize_size, valid_n=2)
    assert idx.max() < 2
    # Gated rows come only from the 2 real images (bucketed to <= 2).
    assert calls and all(n <= 2 for n in calls)
