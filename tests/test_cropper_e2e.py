"""End-to-end pipeline tests: precomputed-landmark fast path (no models).

This is BASELINE config 1 ("CelebA with precomputed landmarks — pure
align+warp+crop"): the whole pipeline must run without any neural model and
produce crops matching a cv2 golden implementation of the same geometry
(estimateAffinePartial2D + warpAffine, as the reference does per face on the
host at cropper.py:514-547).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from face_crop_plus_tpu import Cropper  # noqa: E402
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite  # noqa: E402
from face_crop_plus_tpu.utils.landmarks import make_target_landmarks  # noqa: E402


def _synth_face_image(rng, h=218, w=178):
    """A synthetic CelebA-sized image with smooth structure."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 17) * np.cos(yy / 23),
            128 + 100 * np.cos(xx / 11),
            rng.uniform(0, 255, (h, w)),
        ],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def _synth_landmarks(rng, n):
    """Plausible 5-point landmark sets inside a 178x218 image."""
    base = np.array(
        [[60, 95], [115, 95], [88, 125], [65, 155], [110, 155]], np.float32
    )
    out = []
    for _ in range(n):
        jitter = rng.normal(0, 4, (5, 2)).astype(np.float32)
        out.append(base + jitter)
    return np.stack(out)


@pytest.fixture()
def image_dir(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    for i in range(6):
        name = f"img_{i}.png"
        imwrite(str(d / name), _synth_face_image(rng))
        names.append(name)
    return str(d), names


def _write_landmarks_txt(path, names, landmarks):
    with open(path, "w") as f:
        for name, lm in zip(names, landmarks):
            coords = " ".join(str(float(v)) for v in lm.reshape(-1))
            f.write(f"{name} {coords}\n")


def test_precomputed_landmarks_end_to_end(tmp_path, image_dir, rng):
    input_dir, names = image_dir
    landmarks = _synth_landmarks(rng, len(names))
    lm_file = tmp_path / "landmarks.txt"
    _write_landmarks_txt(lm_file, names, landmarks)
    out_dir = str(tmp_path / "out")

    cropper = Cropper(
        output_size=256,
        face_factor=0.7,
        landmarks=str(lm_file),
        det_threshold=None,
        enh_threshold=None,
        padding="reflect",
        device="cpu",
        batch_size=4,
    )
    cropper.process_dir(input_dir, out_dir, desc=None)

    out_files = sorted(os.listdir(out_dir))
    assert out_files == sorted(names)

    # Golden check: cv2 pipeline for the same geometry.
    target = make_target_landmarks((256, 256), 0.7)
    for name, lm in zip(names, landmarks):
        ours = imread_rgb(os.path.join(out_dir, name))
        assert ours.shape == (256, 256, 3)
        src_img = imread_rgb(os.path.join(input_dir, name))
        mat, _ = cv2.estimateAffinePartial2D(
            lm, target, ransacReprojThreshold=np.inf
        )
        golden = cv2.warpAffine(
            src_img, mat, (256, 256), borderMode=cv2.BORDER_REFLECT
        )
        diff = np.abs(ours.astype(int) - golden.astype(int))
        assert (diff > 3).mean() < 0.02, f"crop mismatch for {name}"


def test_precomputed_multiple_faces_per_file(tmp_path, image_dir, rng):
    # Duplicate file names in the landmarks file mean multiple faces from the
    # same image; with strategy="all" the outputs get counter suffixes.
    input_dir, names = image_dir
    lm = _synth_landmarks(rng, 3)
    lm_file = tmp_path / "landmarks.txt"
    _write_landmarks_txt(lm_file, [names[0], names[0], names[1]], lm)
    out_dir = str(tmp_path / "out")

    cropper = Cropper(
        output_size=128,
        strategy="all",
        landmarks=str(lm_file),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
    )
    cropper.process_dir(input_dir, out_dir, desc=None)

    out_files = sorted(os.listdir(out_dir))
    assert out_files == ["img_0_0.png", "img_0_1.png", "img_1_0.png"]


def test_output_format_override(tmp_path, image_dir, rng):
    input_dir, names = image_dir
    lm = _synth_landmarks(rng, len(names))
    lm_file = tmp_path / "landmarks.txt"
    _write_landmarks_txt(lm_file, names, lm)
    out_dir = str(tmp_path / "out")

    cropper = Cropper(
        output_size=64,
        output_format="jpg",
        landmarks=str(lm_file),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
    )
    cropper.process_dir(input_dir, out_dir, desc=None)
    assert all(f.endswith(".jpg") for f in os.listdir(out_dir))


def test_missing_landmarks_skipped(tmp_path, image_dir, rng):
    # Files absent from the landmarks file are skipped silently
    # (reference cropper.py:804-806).
    input_dir, names = image_dir
    lm = _synth_landmarks(rng, 2)
    lm_file = tmp_path / "landmarks.txt"
    _write_landmarks_txt(lm_file, names[:2], lm)
    out_dir = str(tmp_path / "out")

    cropper = Cropper(
        landmarks=str(lm_file),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
    )
    cropper.process_dir(input_dir, out_dir, desc=None)
    assert sorted(os.listdir(out_dir)) == sorted(names[:2])


def test_empty_dir_is_noop(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    cropper = Cropper(det_threshold=None, enh_threshold=None, device="cpu")
    cropper.process_dir(str(empty), str(tmp_path / "out"), desc=None)
    assert not os.path.exists(str(tmp_path / "out"))


def test_crop_align_empty_input_returns_typed_empty(rng):
    """crop_align([]) must return (0, Ho, Wo, 3) uint8, not a 1-D float64
    array — callers concatenate batch results."""
    from face_crop_plus_tpu import Cropper

    c = Cropper(
        output_size=(48, 32),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
    )
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    crops = c.crop_align(imgs, None, [], np.zeros((0, 5, 2), np.float32))
    assert crops.shape == (0, 32, 48, 3)
    assert crops.dtype == np.uint8
