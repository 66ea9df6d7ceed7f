"""allow_skew e2e: full-affine alignment matches a cv2 golden pipeline."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite
from face_crop_plus_tpu.utils.landmarks import make_target_landmarks


def test_allow_skew_end_to_end(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    yy, xx = np.mgrid[0:200, 0:160].astype(np.float32)
    img = np.clip(
        np.stack([xx * 1.5, yy, (xx + yy) / 2], -1) + rng.normal(0, 8, (200, 160, 3)),
        0,
        255,
    ).astype(np.uint8)
    imwrite(str(d / "a.png"), img)

    # A clearly skewed landmark set (not a pure similarity of the template).
    lm = np.array([[50, 70], [110, 60], [85, 100], [55, 135], [115, 125]], np.float32)
    lm_file = tmp_path / "lm.txt"
    lm_file.write_text("a.png " + " ".join(str(float(v)) for v in lm.reshape(-1)))

    out = str(tmp_path / "out")
    c = Cropper(
        output_size=128,
        face_factor=0.8,
        allow_skew=True,
        landmarks=str(lm_file),
        det_threshold=None,
        enh_threshold=None,
        padding="replicate",
        device="cpu",
    )
    c.process_dir(str(d), out, desc=None)

    ours = imread_rgb(os.path.join(out, "a.png"))
    target = make_target_landmarks((128, 128), 0.8)
    mat, _ = cv2.estimateAffine2D(lm, target, ransacReprojThreshold=np.inf)
    golden = cv2.warpAffine(img, mat, (128, 128), borderMode=cv2.BORDER_REPLICATE)
    diff = np.abs(ours.astype(int) - golden.astype(int))
    assert (diff > 3).mean() < 0.02

    # Sanity: skewed fit differs from the similarity fit.
    sim, _ = cv2.estimateAffinePartial2D(lm, target, ransacReprojThreshold=np.inf)
    assert np.abs(mat - sim).max() > 0.01
