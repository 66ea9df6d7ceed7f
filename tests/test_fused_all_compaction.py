"""Fused strategy="all" path: device compaction must match the staged path.

Round 1 opted strategy="all" with a large face cap out of the fused pipeline
because one program would warp every padded (N × max_faces) slot.  Round 2
splits it into a detect-only program + host compaction + a crop program over
exactly the kept faces — these tests pin that the split path produces the
same crops/indices as the staged path and that it is actually chosen.
"""

import os
import warnings

import numpy as np
import pytest


def _make_cropper(**overrides):
    from face_crop_plus_tpu import Cropper

    kwargs = dict(
        output_size=48,
        resize_size=128,
        strategy="all",
        det_threshold=0.6,
        enh_threshold=None,
        max_faces=16,
        batch_size=4,
        device="cpu",
    )
    kwargs.update(overrides)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        c = Cropper(**kwargs)
    # Random weights: vis=-1 keeps candidates on every image.
    c.det_model.vis_threshold = -1.0
    c.det_model.auto_grow = False
    c.det_model._cap_warned = True
    return c


@pytest.fixture(scope="module")
def batch(rng):
    return np.asarray(
        np.random.default_rng(7).integers(0, 255, (4, 96, 80, 3), dtype=np.uint8)
    )


def test_fused_all_uses_two_program_path(batch):
    c = _make_cropper()
    assert c._fused is not None  # strategy="all" no longer opts out
    crops, lm, idx = c._fused.process(batch, c.resize_size)
    assert crops.dtype == np.uint8 and crops.shape[1:] == (48, 48, 3)
    assert len(crops) == len(idx) == len(lm)
    assert (np.diff(idx) >= 0).all()  # image-major order preserved


def test_fused_all_matches_staged(batch, tmp_path):
    from face_crop_plus_tpu.utils.io import imwrite

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, img in enumerate(batch):
        imwrite(str(in_dir / f"{i}.png"), img)

    # Staged: fused disabled via max_fused_shapes=0.
    c_staged = _make_cropper(max_fused_shapes=0, output_format="png")
    out_staged = str(tmp_path / "staged")
    c_staged.process_dir(str(in_dir), out_staged, desc=None)

    c_fused = _make_cropper(output_format="png")
    out_fused = str(tmp_path / "fused")
    c_fused.process_dir(str(in_dir), out_fused, desc=None)
    # The fused admission heuristic must have engaged for the uniform batch.
    assert len(c_fused._fused_shapes) == 1

    staged = sorted(os.listdir(out_staged))
    fused = sorted(os.listdir(out_fused))
    assert staged == fused and len(staged) > 0

    import cv2

    for name in staged:
        a = cv2.imread(os.path.join(out_staged, name))
        b = cv2.imread(os.path.join(out_fused, name))
        # Staged path detects on host-resized (cv2 AREA/CUBIC) interim
        # images and crops from them; fused detects on device-resized
        # interim and crops from the originals — identical geometry, small
        # interpolation differences.
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.mean() < 8.0, f"{name}: mean {d.mean():.2f}"


def test_fused_all_device_handoff_to_parser(batch):
    c = _make_cropper(attr_groups={"x": [1]}, mask_groups={"m": [2]})
    assert c._fused is not None
    res = c._fused.process(batch, c.resize_size, return_device_crops=True)
    crops, lm, idx, dev = res
    if dev is not None:  # holes from degenerate transforms disable handoff
        assert dev.shape[0] >= len(crops)
        np.testing.assert_array_equal(np.asarray(dev)[: len(crops)], crops)
