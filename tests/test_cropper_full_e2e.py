"""Full-pipeline e2e: detection + enhancement + parsing + grouped saving.

Random weights (structure-level validation): exercises every stage wiring,
the attr × mask output tree (reference cropper.py:611-746) and the
enhancement gate inside the real pipeline.
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
    for i in range(3):
        imwrite(str(d / f"f{i}.png"), rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    return str(d)


def test_full_pipeline_groups_tree(tmp_path, image_dir):
    out_dir = str(tmp_path / "out")
    with pytest.warns(UserWarning):
        cropper = Cropper(
            output_size=48,
            resize_size=96,
            strategy="best",
            det_threshold=-1.0,
            enh_threshold=None,
            attr_groups={"groupA": [1], "groupB": [-1]},
            mask_groups={"maskX": [2]},
            batch_size=3,
            device="cpu",
        )
        # Make grouping deterministic with random weights: everything matches
        # groupA or groupB (they partition on attribute 1), and maskX matches
        # when attribute 2 is present.
        cropper.par_model.attr_threshold = -1  # count > -1 always true for >=0
        cropper.par_model.mask_threshold = -1  # every face joins maskX
    cropper.process_dir(image_dir, out_dir, desc=None)

    # Tree: out/<attr>/<mask>/ files and out/<attr>/<mask>_mask/ masks.
    assert os.path.isdir(out_dir)
    saved = []
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            saved.append(os.path.relpath(os.path.join(root, f), out_dir))
    assert saved, "nothing was saved"
    for rel in saved:
        parts = rel.split(os.sep)
        assert len(parts) == 3, f"expected attr/mask/file structure, got {rel}"
        assert parts[0] in ("groupA", "groupB")
        assert parts[1] in ("maskX", "maskX_mask")
        img = imread_rgb(os.path.join(out_dir, rel))
        assert img.shape[:2] == (48, 48)
    # Each face saved in a mask dir has a matching mask image.
    face_files = {p for p in saved if p.split(os.sep)[1] == "maskX"}
    mask_files = {p.replace("maskX_mask", "maskX") for p in saved
                  if p.split(os.sep)[1] == "maskX_mask"}
    assert face_files == mask_files


def test_full_pipeline_with_enhancement(tmp_path, image_dir):
    out_dir = str(tmp_path / "out")
    with pytest.warns(UserWarning):
        cropper = Cropper(
            output_size=32,
            resize_size=64,
            strategy="best",
            det_threshold=-1.0,
            enh_threshold=1.0,  # everything is below factor 1.0 -> enhance all
            batch_size=3,
            device="cpu",
        )
        cropper.enh_model.num_blocks = 2  # keep CPU test fast
        cropper.enh_model.params = {
            k: v for k, v in cropper.enh_model._init_fn()().items()
        }
    cropper.process_dir(image_dir, out_dir, desc=None)
    outs = sorted(os.listdir(out_dir))
    assert outs == ["f0.png", "f1.png", "f2.png"]
    for f in outs:
        assert imread_rgb(os.path.join(out_dir, f)).shape == (32, 32, 3)
