"""Parity tests: batched device warp vs cv2.warpAffine ground truth.

cv2 uses fixed-point interpolation internally (5 fractional coordinate bits)
so exact bit equality is not expected; tolerance of a few intensity levels on
>99% of pixels is the parity criterion.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from face_crop_plus_tpu.ops.warp import to_uint8, warp_affine_batch  # noqa: E402

_CV2_BORDER = {
    "constant": cv2.BORDER_CONSTANT,
    "replicate": cv2.BORDER_REPLICATE,
    "reflect": cv2.BORDER_REFLECT,
    "wrap": cv2.BORDER_WRAP,
    "reflect_101": cv2.BORDER_REFLECT_101,
}


def _rand_image(rng, h=64, w=80):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _rand_matrix(rng):
    theta = rng.uniform(-0.5, 0.5)
    s = rng.uniform(0.5, 2.0)
    tx, ty = rng.uniform(-20, 20, 2)
    return np.array(
        [
            [s * np.cos(theta), -s * np.sin(theta), tx],
            [s * np.sin(theta), s * np.cos(theta), ty],
        ],
        dtype=np.float32,
    )


def _compare(ours, ref, max_frac_diff=0.02, tol=3):
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    frac_bad = (diff > tol).mean()
    assert frac_bad <= max_frac_diff, f"{frac_bad:.4f} of pixels differ by >{tol}"


@pytest.mark.parametrize("mode", list(_CV2_BORDER))
def test_warp_matches_cv2_border_modes(rng, mode):
    imgs = np.stack([_rand_image(rng) for _ in range(4)])
    mats = np.stack([_rand_matrix(rng) for _ in range(4)])
    idx = np.arange(4, dtype=np.int32)
    out = to_uint8(warp_affine_batch(imgs, mats, idx, (48, 40), mode))
    out = np.asarray(out)
    for i in range(4):
        ref = cv2.warpAffine(imgs[i], mats[i], (48, 40), borderMode=_CV2_BORDER[mode])
        _compare(out[i], ref)


def test_warp_smooth_image_close(rng):
    # On a smooth image the fixed-point quantization error vanishes, so the
    # tolerance can be tight everywhere.
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = np.stack([xx * 2, yy * 2, xx + yy], axis=-1).astype(np.uint8)
    mats = np.stack([_rand_matrix(rng) for _ in range(3)])
    idx = np.zeros(3, np.int32)
    out = np.asarray(
        to_uint8(warp_affine_batch(img[None], mats, idx, (32, 32), "replicate"))
    )
    for i in range(3):
        ref = cv2.warpAffine(img, mats[i], (32, 32), borderMode=cv2.BORDER_REPLICATE)
        _compare(out[i], ref, max_frac_diff=0.02, tol=2)


def test_warp_window_equals_host_crop(rng):
    # Sampling with an un-padded window must equal slicing the padding off on
    # the host and warping the smaller image (reference cropper.py:536-539).
    img = _rand_image(rng, 72, 90)
    t, b, l, r = 4, 6, 8, 2
    padded = cv2.copyMakeBorder(img, t, b, l, r, borderType=cv2.BORDER_CONSTANT)
    mat = _rand_matrix(rng)[None]
    idx = np.zeros(1, np.int32)
    win = np.array([[t, l, img.shape[0], img.shape[1]]], np.int32)

    via_window = np.asarray(
        to_uint8(
            warp_affine_batch(padded[None], mat, idx, (48, 48), "reflect", win)
        )
    )[0]
    direct = np.asarray(
        to_uint8(warp_affine_batch(img[None], mat, idx, (48, 48), "reflect"))
    )[0]
    np.testing.assert_array_equal(via_window, direct)


def test_face_batch_indexing(rng):
    # Multiple faces may come from the same image; img_idx routes them.
    imgs = np.stack([_rand_image(rng), _rand_image(rng)])
    mat = np.eye(2, 3, dtype=np.float32)
    mats = np.stack([mat, mat, mat])
    idx = np.array([0, 1, 0], np.int32)
    out = np.asarray(
        to_uint8(warp_affine_batch(imgs, mats, idx, (16, 16), "constant"))
    )
    np.testing.assert_array_equal(out[0], out[2])
    assert not np.array_equal(out[0], out[1])


@pytest.mark.parametrize("mode", ["replicate", "reflect_101"])
def test_warp_one_pixel_window_at_far_edge(rng, mode):
    """A 1-pixel-wide window flush with the image's right edge must sample
    the window's only column, not its left neighbor (the 2-wide gather
    start is clamped and the shift carried into the bilinear fraction)."""
    import numpy as np

    from face_crop_plus_tpu.ops.warp import warp_affine_batch

    h = w = 8
    img = rng.integers(0, 255, (1, h, w, 3), np.uint8).astype(np.float32)
    # Make the last column distinctive.
    img[0, :, -1, :] = 200.0
    img[0, :, -2, :] = 10.0

    mats = np.eye(2, 3, dtype=np.float32)[None]  # output == window coords
    idx = np.zeros(1, np.int32)
    win = np.array([[0, w - 1, 4, 1]], np.int32)  # (top, left, h', w'=1)
    out = np.asarray(
        warp_affine_batch(img, mats, idx, (2, 4), mode, win)
    )
    # Every sample maps into the single window column == absolute col w-1.
    np.testing.assert_allclose(out[0, :, :, 0], 200.0, atol=1e-4)
