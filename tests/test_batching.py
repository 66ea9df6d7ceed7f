"""Tests for host-side ragged batching (resize + pad geometry)."""

import numpy as np
import pytest

from face_crop_plus_tpu.utils.batching import (
    as_batch,
    bucket_size,
    pad_batch_to,
)


def test_as_batch_shapes(rng):
    imgs = [
        rng.integers(0, 255, (200, 100, 3), dtype=np.uint8),
        rng.integers(0, 255, (50, 300, 3), dtype=np.uint8),
        rng.integers(0, 255, (128, 128, 3), dtype=np.uint8),
    ]
    batch, unscales, paddings = as_batch(imgs, (128, 128))
    assert batch.shape == (3, 128, 128, 3)
    assert unscales.shape == (3,)
    assert paddings.shape == (3, 4)


def test_as_batch_geometry_tall_image(rng):
    # 200x100 (h x w) into 128x128: height-limited, width padded.
    img = rng.integers(0, 255, (200, 100, 3), dtype=np.uint8)
    batch, unscales, paddings = as_batch([img], (128, 128))
    assert np.isclose(unscales[0], 128 / 200)
    t, b, l, r = paddings[0]
    assert t == b == 0
    ww = int(100 * 128 / 200)
    assert l + r == 128 - ww
    assert abs(l - r) <= 1
    # Padded columns are zeros for constant mode.
    assert batch[0, :, :l].sum() == 0


def test_as_batch_unscale_roundtrip(rng):
    # A landmark at original coords maps into the batch by *unscale + pad,
    # and back by the inverse (this is how detection undoes the batching).
    img = rng.integers(0, 255, (400, 640, 3), dtype=np.uint8)
    _, unscales, paddings = as_batch([img], (512, 512))
    pt = np.array([320.0, 200.0])
    t, b, l, r = paddings[0]
    batch_pt = pt * unscales[0] + np.array([l, t])
    back = (batch_pt - np.array([l, t])) / unscales[0]
    np.testing.assert_allclose(back, pt, rtol=1e-6)


@pytest.mark.parametrize("mode", ["constant", "replicate", "reflect", "wrap"])
def test_as_batch_padding_modes(rng, mode):
    img = rng.integers(1, 255, (100, 50, 3), dtype=np.uint8)
    batch, _, _ = as_batch([img], (64, 64), padding_mode=mode)
    assert batch.shape == (1, 64, 64, 3)
    if mode != "constant":
        assert (batch[0, :, 0] > 0).any()  # padded region not blank


def test_pad_batch_to():
    x = np.arange(12).reshape(3, 4)
    padded, valid = pad_batch_to(x, 5)
    assert padded.shape == (5, 4)
    assert valid == 3
    np.testing.assert_array_equal(padded[3], x[-1])
    with pytest.raises(ValueError):
        pad_batch_to(x, 2)


def test_bucket_size():
    buckets = (1, 2, 4, 8)
    assert bucket_size(1, buckets) == 1
    assert bucket_size(3, buckets) == 4
    assert bucket_size(8, buckets) == 8
    # Beyond the largest bucket: next multiple of it, so the
    # bucket_size→pad_batch_to pairing never raises.
    assert bucket_size(9, buckets) == 16
    assert bucket_size(17, buckets) == 24
    padded, valid = pad_batch_to(
        np.zeros((9, 2, 2, 3), np.uint8), bucket_size(9, buckets)
    )
    assert padded.shape[0] == 16 and valid == 9


def test_pad_batch_to_empty_batch():
    padded, valid = pad_batch_to(np.zeros((0, 4, 4, 3), np.uint8), 8)
    assert padded.shape == (8, 4, 4, 3) and valid == 0


def test_as_batch_extreme_aspect_ratio_survives():
    """Degenerate aspect ratios clamp to a 1-px side instead of crashing.

    The reference crashes inside cv2.resize when the scaled short side
    truncates to 0 (reference utils.py:334, inv_scale_x > 0); one
    pathological image must not kill a directory run.
    """
    import numpy as np

    from face_crop_plus_tpu.utils.batching import as_batch

    for shape, size in [
        ((800, 4, 3), (600, 16)),
        ((4, 800, 3), (16, 600)),
        ((3000, 3, 3), (64, 64)),
    ]:
        batch, unscales, pads = as_batch([np.zeros(shape, np.uint8)], size)
        assert batch.shape == (1, size[1], size[0], 3)
        t, b, l, r = pads[0]
        assert t + b < size[1] and l + r < size[0]  # >= 1 px of image left
        assert np.isfinite(unscales[0]) and unscales[0] > 0
