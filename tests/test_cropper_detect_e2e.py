"""End-to-end detection-mode pipeline test (random detector weights).

Exercises BASELINE config 2's code path (detect → un-pad landmarks → align →
crop → save) structurally: with random weights the landmarks are arbitrary
but the full device pipeline, padding bookkeeping and output contract must
hold.
"""

import os

import numpy as np
import pytest

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite


@pytest.fixture()
def image_dir(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        img = rng.integers(0, 255, (120 + 10 * i, 160, 3), dtype=np.uint8)
        imwrite(str(d / f"pic_{i}.png"), img)
    return str(d)


def test_detection_mode_end_to_end(tmp_path, image_dir):
    out_dir = str(tmp_path / "out")
    with pytest.warns(UserWarning, match="random"):
        cropper = Cropper(
            output_size=64,
            resize_size=128,
            strategy="best",
            det_threshold=-1.0,  # random weights: accept any score
            enh_threshold=None,
            device="cpu",
            batch_size=4,
        )
    # vis=-1 ensures a "face" per image even with random weights.
    cropper.process_dir(image_dir, out_dir, desc=None)

    outs = sorted(os.listdir(out_dir))
    assert outs == [f"pic_{i}.png" for i in range(4)]
    for f in outs:
        im = imread_rgb(os.path.join(out_dir, f))
        assert im.shape == (64, 64, 3)


def test_detection_mode_no_faces(tmp_path, image_dir):
    out_dir = str(tmp_path / "out")
    with pytest.warns(UserWarning, match="random"):
        cropper = Cropper(
            output_size=64,
            resize_size=128,
            strategy="all",
            det_threshold=2.0,  # impossible: no detections
            enh_threshold=None,
            device="cpu",
        )
    cropper.process_dir(image_dir, out_dir, desc=None)
    assert not os.path.exists(out_dir)
