"""No-model pass-through mode with ragged inputs (found by a CLI smoke).

With detection disabled, no landmarks, no enhancement and no parsing, the
pipeline degrades to a copy of the (possibly differently-sized) images —
the reference handles ragged lists here; so must we.
"""

import os

import numpy as np

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite


def test_ragged_passthrough(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    shapes = [(40, 60, 3), (80, 30, 3), (55, 55, 3)]
    for i, s in enumerate(shapes):
        imwrite(str(d / f"r{i}.png"), rng.integers(0, 255, s, dtype=np.uint8))

    out = str(tmp_path / "out")
    c = Cropper(det_threshold=None, enh_threshold=None, device="cpu")
    c.process_dir(str(d), out, desc=None)

    assert sorted(os.listdir(out)) == ["r0.png", "r1.png", "r2.png"]
    for i, s in enumerate(shapes):
        img = imread_rgb(os.path.join(out, f"r{i}.png"))
        assert img.shape == s  # sizes preserved, content copied
        src = imread_rgb(os.path.join(d, f"r{i}.png"))
        np.testing.assert_array_equal(img, src)


def test_ragged_parse_mode_raises_clear_error(tmp_path, rng):
    """No-crop parse mode on mixed-size images: a clear ValueError, not a
    cryptic np.stack failure (same constraint as the reference README)."""
    import pytest

    d = tmp_path / "in"
    os.makedirs(d)
    imwrite(str(d / "a.jpg"), rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    imwrite(str(d / "b.jpg"), rng.integers(0, 255, (48, 40, 3), dtype=np.uint8))
    c = Cropper(
        det_threshold=None,
        enh_threshold=None,
        mask_groups={"nose": [10]},
        device="cpu",
    )
    with pytest.raises(ValueError, match="share dimensions"):
        c.process_dir(str(d), str(tmp_path / "out"), desc=None)
