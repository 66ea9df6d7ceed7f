"""Pure enhancement/parsing mode (no detection, no landmarks, no cropping).

The reference documents this secondary flow (README: det_threshold=None ⇒
no detection/alignment; RRDB enhances every image; BiSeNet groups the
original images, which must share dimensions).
"""

import os

import numpy as np
import pytest

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite


@pytest.fixture()
def uniform_dir(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        imwrite(str(d / f"u{i}.png"), rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    return str(d)


def test_enhance_all_no_crop(tmp_path, uniform_dir):
    out = str(tmp_path / "out")
    with pytest.warns(UserWarning):
        c = Cropper(
            det_threshold=None,
            enh_threshold=0.5,
            landmarks=None,
            device="cpu",
            batch_size=4,
        )
        c.enh_model.num_blocks = 2
        c.enh_model.params = c.enh_model._init_fn()()
    c.process_dir(uniform_dir, out, desc=None)
    outs = sorted(os.listdir(out))
    assert outs == ["u0.png", "u1.png", "u2.png"]
    for f in outs:
        # No cropping: images keep their original size, but are enhanced.
        img = imread_rgb(os.path.join(out, f))
        assert img.shape == (48, 48, 3)
        src = imread_rgb(os.path.join(uniform_dir, f))
        assert not np.array_equal(img, src)


def test_parse_originals_no_crop(tmp_path, uniform_dir):
    out = str(tmp_path / "out")
    with pytest.warns(UserWarning):
        c = Cropper(
            det_threshold=None,
            enh_threshold=None,
            attr_groups={"g": [1], "not_g": [-1]},
            device="cpu",
            batch_size=4,
        )
        c.par_model.attr_threshold = -1  # deterministic with random weights
    c.process_dir(uniform_dir, out, desc=None)
    # Images grouped into attribute subdirectories at original size.
    found = []
    for root, _d, files in os.walk(out):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), out)
            found.append(rel)
            assert rel.split(os.sep)[0] == "g"  # threshold -1 => all in "g"
    assert len(found) == 3
