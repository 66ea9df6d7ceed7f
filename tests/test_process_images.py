"""In-memory serving API: process_images (no filesystem)."""

import numpy as np
import pytest

from face_crop_plus_tpu import Cropper


@pytest.fixture(scope="module")
def cropper():
    with pytest.warns(UserWarning):
        return Cropper(
            output_size=48,
            resize_size=96,
            strategy="best",
            det_threshold=-1.0,
            enh_threshold=None,
            device="cpu",
            batch_size=4,
        )


def test_uniform_batch(cropper, rng):
    imgs = rng.integers(0, 255, (4, 80, 64, 3), dtype=np.uint8)
    crops, indices, groups = cropper.process_images(imgs)
    assert crops.shape == (4, 48, 48, 3)
    np.testing.assert_array_equal(indices, np.arange(4))
    assert groups == (None, None)


def test_ragged_list(cropper, rng):
    imgs = [
        rng.integers(0, 255, (80, 64, 3), dtype=np.uint8),
        rng.integers(0, 255, (60, 90, 3), dtype=np.uint8),
    ]
    crops, indices, _ = cropper.process_images(imgs)
    assert crops.shape == (2, 48, 48, 3)
    np.testing.assert_array_equal(np.sort(indices), [0, 1])


def test_partial_batch_reuses_program(cropper, rng):
    # Fewer images than batch_size must not change the output contract.
    imgs = rng.integers(0, 255, (2, 80, 64, 3), dtype=np.uint8)
    crops, indices, _ = cropper.process_images(imgs)
    assert crops.shape[0] == 2
    assert set(indices) <= {0, 1}


def test_with_parsing(rng):
    with pytest.warns(UserWarning):
        c = Cropper(
            output_size=32,
            resize_size=64,
            strategy="best",
            det_threshold=-1.0,
            enh_threshold=None,
            attr_groups={"g": [1]},
            device="cpu",
            batch_size=4,
        )
    c.par_model.attr_threshold = -1
    imgs = rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    crops, indices, (attr, mask) = c.process_images(imgs)
    assert attr is not None and attr["g"] == [0, 1, 2, 3]
    assert mask is None


def test_stream_matches_per_call(cropper, rng, monkeypatch):
    monkeypatch.setenv("FCPT_HOST_CROP", "1")
    batches = [
        rng.integers(0, 255, (4, 80, 64, 3), dtype=np.uint8)
        for _ in range(5)
    ]
    streamed = list(cropper.process_images_stream(batches, depth=2))
    assert len(streamed) == 5
    for batch, (crops, indices, groups) in zip(batches, streamed):
        ref_crops, ref_idx, ref_groups = cropper.process_images(batch)
        np.testing.assert_array_equal(crops, ref_crops)
        np.testing.assert_array_equal(indices, ref_idx)
        assert groups == ref_groups


def test_stream_depths_agree(cropper, rng, monkeypatch):
    monkeypatch.setenv("FCPT_HOST_CROP", "1")
    batches = [
        rng.integers(0, 255, (4, 80, 64, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    d1 = list(cropper.process_images_stream(batches, depth=1))
    d3 = list(cropper.process_images_stream(batches, depth=3))
    for (c1, i1, _), (c3, i3, _) in zip(d1, d3):
        np.testing.assert_array_equal(c1, c3)
        np.testing.assert_array_equal(i1, i3)


def test_stream_mixed_fallback(cropper, rng, monkeypatch):
    # A ragged batch mid-stream drains the queue and serializes that
    # batch; uniform neighbors still pipeline. Order must be preserved.
    monkeypatch.setenv("FCPT_HOST_CROP", "1")
    uniform = rng.integers(0, 255, (4, 80, 64, 3), dtype=np.uint8)
    ragged = [
        rng.integers(0, 255, (80, 64, 3), dtype=np.uint8),
        rng.integers(0, 255, (60, 90, 3), dtype=np.uint8),
    ]
    out = list(cropper.process_images_stream([uniform, ragged, uniform]))
    assert [len(o[0]) for o in out] == [4, 2, 4]
    ref = cropper.process_images(ragged)
    np.testing.assert_array_equal(out[1][0], ref[0])


def test_stream_packed_upload(cropper, rng, monkeypatch):
    # pack_upload sends detect inputs as 4:2:0 rows; crops still warp
    # from the caller's RGB, so faces/indices match and pixels sit
    # within the 4:2:0 detection-input band.
    import cv2

    monkeypatch.setenv("FCPT_HOST_CROP", "1")
    batch = np.stack([
        cv2.GaussianBlur(
            rng.integers(0, 255, (80, 64, 3), dtype=np.uint8), (11, 11), 4
        )
        for _ in range(4)
    ])
    plain = list(cropper.process_images_stream([batch, batch], depth=2))
    packed = list(
        cropper.process_images_stream([batch, batch], depth=2, pack_upload=True)
    )
    for (c1, i1, _), (c2, i2, _) in zip(plain, packed):
        assert len(c1) == len(c2)
        np.testing.assert_array_equal(i1, i2)
        d = np.abs(c1.astype(int) - c2.astype(int))
        assert d.mean() < 4.0


def test_stream_requires_detector(rng):
    c = Cropper(det_threshold=None, enh_threshold=None, device="cpu")
    with pytest.raises(ValueError, match="detector"):
        list(c.process_images_stream([np.zeros((1, 32, 32, 3), np.uint8)]))


def test_requires_detector(rng):
    c = Cropper(det_threshold=None, enh_threshold=None, device="cpu")
    with pytest.raises(ValueError, match="detector"):
        c.process_images(rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8))


def test_process_images_empty_input():
    import warnings

    import numpy as np

    from face_crop_plus_tpu import Cropper

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        c = Cropper(output_size=32, resize_size=(64, 64), det_threshold=0.6,
                    enh_threshold=None, device="cpu")
    crops, idx, groups = c.process_images([])
    assert crops.shape == (0, 32, 32, 3) and idx.shape == (0,)
    assert groups == (None, None)
