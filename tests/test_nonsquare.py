"""Non-square sizes through the full stack (anchors, detector, pipeline)."""

import os

import numpy as np
import pytest

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.ops.anchors import anchor_grid, num_anchors
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite


def test_anchors_nonsquare():
    a = anchor_grid(96, 64)
    assert a.shape == (num_anchors(96, 64), 4)
    # cx normalized by width, cy by height: different raster pitches.
    assert not np.isclose(a[:, 2], a[:, 3]).all()  # w/h ratios differ


def test_detector_nonsquare(rng):
    from face_crop_plus_tpu.models.detection import RetinaFace

    with pytest.warns(UserWarning):
        det = RetinaFace(strategy="best", vis=-1.0, pre_topk=32, device=None)
    imgs = rng.integers(0, 255, (2, 96, 64, 3), dtype=np.uint8)
    lm, idx = det.predict(imgs)
    assert idx == [0, 1]
    # Landmarks decode within the pixel frame (finite and plausibly scaled).
    assert np.isfinite(lm).all()


def test_pipeline_nonsquare_sizes(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        imwrite(str(d / f"n{i}.png"), rng.integers(0, 255, (90, 120, 3), dtype=np.uint8))
    out = str(tmp_path / "out")
    with pytest.warns(UserWarning):
        c = Cropper(
            output_size=(64, 48),     # non-square crop (width, height)
            resize_size=(128, 96),    # non-square interim (width, height)
            strategy="best",
            det_threshold=-1.0,
            enh_threshold=None,
            device="cpu",
            batch_size=3,
        )
    c.process_dir(str(d), out, desc=None)
    outs = sorted(os.listdir(out))
    assert outs == ["n0.png", "n1.png", "n2.png"]
    for f in outs:
        img = imread_rgb(os.path.join(out, f))
        assert img.shape == (48, 64, 3)  # (H, W) = reversed output_size


def test_landmark_path_nonsquare_output(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    imwrite(str(d / "a.png"), rng.integers(0, 255, (100, 100, 3), dtype=np.uint8))
    lm = tmp_path / "lm.txt"
    lm.write_text("a.png 30 35 70 35 50 55 35 75 65 75\n")
    out = str(tmp_path / "out")
    c = Cropper(
        output_size=(80, 40),
        landmarks=str(lm),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
    )
    c.process_dir(str(d), out, desc=None)
    assert imread_rgb(os.path.join(out, "a.png")).shape == (40, 80, 3)
