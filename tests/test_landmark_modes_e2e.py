"""e2e coverage for remaining landmark-file variants (68-point, CSV, JSON)."""

import json
import os

import numpy as np
import pytest

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite


@pytest.fixture()
def img_dir(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(2):
        imwrite(str(d / f"p{i}.png"), rng.integers(0, 255, (120, 100, 3), dtype=np.uint8))
    return str(d)


def _landmarks68(rng):
    """A 68-point set with known 5-point reduction anchors in-range."""
    lm = rng.uniform(20, 90, (68, 2)).astype(np.float32)
    return lm


def test_68_point_txt_pipeline(tmp_path, img_dir, rng):
    lines = []
    lms = []
    for i in range(2):
        lm = _landmarks68(rng)
        lms.append(lm)
        lines.append(f"p{i}.png " + " ".join(str(float(v)) for v in lm.reshape(-1)))
    f = tmp_path / "lm68.txt"
    f.write_text("\n".join(lines))

    out = str(tmp_path / "out")
    c = Cropper(
        output_size=40,
        landmarks=str(f),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
    )
    c.process_dir(img_dir, out, desc=None)
    assert sorted(os.listdir(out)) == ["p0.png", "p1.png"]
    assert imread_rgb(os.path.join(out, "p0.png")).shape == (40, 40, 3)


def test_json_landmarks_pipeline(tmp_path, img_dir, rng):
    data = {}
    for i in range(2):
        lm = rng.uniform(20, 90, (5, 2))
        data[f"p{i}.png"] = [float(v) for v in lm.reshape(-1)]
    f = tmp_path / "lm.json"
    f.write_text(json.dumps(data))

    out = str(tmp_path / "out")
    c = Cropper(
        output_size=32,
        landmarks=str(f),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
    )
    c.process_dir(img_dir, out, desc=None)
    assert sorted(os.listdir(out)) == ["p0.png", "p1.png"]


def test_csv_landmarks_pipeline(tmp_path, img_dir, rng):
    rows = ["images," + ",".join(f"x{i},y{i}" for i in range(5))]
    for i in range(2):
        lm = rng.uniform(20, 90, (5, 2))
        rows.append(f"p{i}.png," + ",".join(str(float(v)) for v in lm.reshape(-1)))
    f = tmp_path / "lm.csv"
    f.write_text("\n".join(rows))

    out = str(tmp_path / "out")
    c = Cropper(
        output_size=32,
        landmarks=str(f),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
    )
    c.process_dir(img_dir, out, desc=None)
    assert sorted(os.listdir(out)) == ["p0.png", "p1.png"]


def test_tuple_landmarks_api(tmp_path, img_dir, rng):
    # Landmarks may be passed directly as (array, filenames) — reference
    # cropper.py:236-244.
    lm = rng.uniform(20, 90, (2, 5, 2)).astype(np.float32)
    names = np.array(["p0.png", "p1.png"])
    out = str(tmp_path / "out")
    c = Cropper(
        output_size=32,
        landmarks=(lm, names),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
    )
    c.process_dir(img_dir, out, desc=None)
    assert sorted(os.listdir(out)) == ["p0.png", "p1.png"]
