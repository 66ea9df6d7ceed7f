"""Tests for landmark parsing, slicing tables and the target template."""

import json

import numpy as np
import pytest

from face_crop_plus_tpu.utils.landmarks import (
    STANDARD_LANDMARKS_5,
    get_landmark_slices_5,
    get_ldm_slices,
    make_target_landmarks,
    parse_landmarks_file,
    reduce_landmarks,
)


def test_standard_landmarks_shape_and_range():
    assert STANDARD_LANDMARKS_5.shape == (5, 2)
    assert (STANDARD_LANDMARKS_5 > 0).all() and (STANDARD_LANDMARKS_5 < 1).all()
    # Eyes level, mouth level, nose between.
    assert STANDARD_LANDMARKS_5[0, 1] == STANDARD_LANDMARKS_5[1, 1]
    assert STANDARD_LANDMARKS_5[3, 1] == STANDARD_LANDMARKS_5[4, 1]


@pytest.mark.parametrize("n", [5, 12, 17, 21, 29, 49, 68, 98, 106])
def test_slices_supported_schemes(n):
    slices = get_landmark_slices_5(n)
    assert len(slices) == 5
    for s in slices:
        assert 0 <= s.start < s.stop <= n


def test_slices_unsupported():
    with pytest.raises(ValueError):
        get_landmark_slices_5(7)
    with pytest.raises(ValueError):
        get_ldm_slices(3, 68)


def test_reduce_landmarks_68(rng):
    lm = rng.uniform(0, 100, size=(3, 68, 2)).astype(np.float32)
    red = reduce_landmarks(lm)
    assert red.shape == (3, 5, 2)
    # Nose tip for 68-point scheme is index 30 exactly.
    np.testing.assert_allclose(red[:, 2], lm[:, 30])
    # Left eye is the mean of points 36..41.
    np.testing.assert_allclose(red[:, 0], lm[:, 36:42].mean(1), rtol=1e-5)


def test_parse_txt(tmp_path):
    p = tmp_path / "lm.txt"
    p.write_text("a.jpg 1 2 3 4\nb.jpg 5 6 7 8\n")
    lm, names = parse_landmarks_file(str(p))
    assert lm.shape == (2, 2, 2)
    assert list(names) == ["a.jpg", "b.jpg"]
    np.testing.assert_allclose(lm[0], [[1, 2], [3, 4]])


def test_parse_csv(tmp_path):
    p = tmp_path / "lm.csv"
    p.write_text("images,x1,y1,x2,y2\na.jpg,1,2,3,4\nb.jpg,5,6,7,8\n")
    lm, names = parse_landmarks_file(str(p))
    assert lm.shape == (2, 2, 2)
    assert list(names) == ["a.jpg", "b.jpg"]


def test_parse_json(tmp_path):
    p = tmp_path / "lm.json"
    p.write_text(json.dumps({"a.jpg": [1, 2, 3, 4], "b.jpg": [5, 6, 7, 8]}))
    lm, names = parse_landmarks_file(str(p))
    assert lm.shape == (2, 2, 2)
    assert list(names) == ["a.jpg", "b.jpg"]


def test_make_target_landmarks_geometry():
    tgt = make_target_landmarks((256, 256), 1.0)
    np.testing.assert_allclose(tgt, STANDARD_LANDMARKS_5 * 256, rtol=1e-6)
    # Halving the face factor shrinks the spread around the center by 2.
    tgt_half = make_target_landmarks((256, 256), 0.5)
    center = np.array([128.0, 128.0])
    np.testing.assert_allclose(tgt_half - center, (tgt - center) / 2, atol=1e-4)
    with pytest.raises(ValueError):
        make_target_landmarks((256, 256), 0.65, num_std_landmarks=4)
