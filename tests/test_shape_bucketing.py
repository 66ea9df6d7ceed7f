"""Bounded per-shape fused bucketing: mixed directories process correctly."""

import os

import numpy as np
import pytest

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite


def test_mixed_shapes_partial_fusion(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    # Dominant shape (6 files) + two odd sizes.
    for i in range(6):
        n = f"a{i}.png"
        imwrite(str(d / n), rng.integers(0, 255, (96, 80, 3), dtype=np.uint8))
        names.append(n)
    for i, hw in enumerate([(70, 90), (50, 60)]):
        n = f"odd{i}.png"
        imwrite(str(d / n), rng.integers(0, 255, hw + (3,), dtype=np.uint8))
        names.append(n)

    out = str(tmp_path / "out")
    with pytest.warns(UserWarning):
        c = Cropper(
            output_size=48,
            resize_size=96,
            strategy="best",
            det_threshold=-1.0,
            enh_threshold=None,
            device="cpu",
            batch_size=8,
        )
    c.process_dir(d.as_posix(), out, desc=None)

    # The dominant shape was granted a fused program; odd shapes went
    # through the staged path — all images produce crops either way.
    assert (96, 80, 3) in c._fused_shapes
    assert sorted(os.listdir(out)) == sorted(names)
    for n in names:
        assert imread_rgb(os.path.join(out, n)).shape == (48, 48, 3)


def test_fused_shape_budget_respected(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    # Six distinct shapes, each a full batch — only max_fused_shapes get
    # fused programs.
    shapes = [(64 + 8 * i, 64, 3) for i in range(6)]
    names = []
    for s, shape in enumerate(shapes):
        for i in range(4):
            n = f"s{s}_{i}.png"
            imwrite(str(d / n), rng.integers(0, 255, shape, dtype=np.uint8))
            names.append(n)

    out = str(tmp_path / "out")
    with pytest.warns(UserWarning):
        c = Cropper(
            output_size=32,
            resize_size=64,
            strategy="best",
            det_threshold=-1.0,
            enh_threshold=None,
            device="cpu",
            batch_size=4,
        )
    c.max_fused_shapes = 2
    c.process_dir(d.as_posix(), out, desc=None)

    assert len(c._fused_shapes) <= 2
    assert sorted(os.listdir(out)) == sorted(names)
