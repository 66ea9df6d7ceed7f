"""Host-side ragged-image batching: aspect-preserving resize + center pad.

XLA requires static shapes, so ragged directory images are normalized on the
host into fixed-shape device batches.  The geometry (scale factors, padding
amounts, interpolation choice) matches reference
``src/face_crop_plus/utils.py:273-342`` exactly so that landmark coordinates
and crops are comparable: resize so neither dimension exceeds the target while
keeping aspect ratio (INTER_AREA when downscaling, INTER_CUBIC when
upscaling), then center-pad the short dimension.

This module also provides size bucketing: to keep the number of distinct
compiled XLA programs small while supporting heterogeneous directories, batch
shapes are drawn from a small set of buckets rather than per-image shapes.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - environment dependent
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

#: Supported padding mode names (cv2 BorderTypes, lowercase).
PADDING_MODES = ("constant", "replicate", "reflect", "wrap", "reflect_101")


def _resize(image: np.ndarray, wh: tuple[int, int], upscale: bool) -> np.ndarray:
    if _HAS_CV2:
        interp = cv2.INTER_CUBIC if upscale else cv2.INTER_AREA
        return cv2.resize(image, wh, interpolation=interp)
    # Pillow fallback (BICUBIC both ways; AREA ~ BOX reduction).
    from PIL import Image

    resample = Image.BICUBIC if upscale else Image.BOX
    return np.asarray(Image.fromarray(image).resize(wh, resample))


def _pad(image: np.ndarray, tblr: list[int], mode: str) -> np.ndarray:
    t, b, l, r = tblr
    if _HAS_CV2:
        border = getattr(cv2, f"BORDER_{mode.upper()}")
        return cv2.copyMakeBorder(image, t, b, l, r, borderType=border)
    np_mode = {
        "constant": "constant",
        "replicate": "edge",
        "reflect": "symmetric",
        "wrap": "wrap",
        "reflect_101": "reflect",
    }[mode]
    pad_width = [(t, b), (l, r)] + [(0, 0)] * (image.ndim - 2)
    return np.pad(image, pad_width, mode=np_mode)


def as_batch(
    images: list[np.ndarray],
    size: int | tuple[int, int] = 512,
    padding_mode: str = "constant",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stacks ragged images into a fixed-shape (N, H, W, 3) batch.

    Each image is resized (aspect preserved) so that it fits inside ``size``
    (given as (width, height)) and the short dimension is center-padded.

    Returns:
        Tuple of the uint8 image batch (N, H, W, 3), float32 un-scale factors
        (N,) mapping batch coordinates back to original-image coordinates, and
        int64 paddings (N, 4) in (top, bottom, left, right) order.
    """
    size = (size, size) if isinstance(size, int) else tuple(size)
    tw, th = size
    img_batch, unscales, paddings = [], [], []

    for image in images:
        h, w = image.shape[:2]
        # Interpolation parity with reference utils.py:320: CUBIC unless the
        # longest image side exceeds the longest target side.  For non-square
        # targets this can pick CUBIC for a mild downscale — kept as-is so
        # resized pixels (and thus landmark positions) stay comparable.
        upscale = max(h, w) <= max(size)

        # The binding axis is the one with the smaller target/source ratio;
        # compare as integer cross-products (tw/w < th/h ⟺ tw·h < th·w) to
        # avoid float-rounding flips on near-square inputs.  That axis fills
        # its target dimension exactly; the other scales by the same factor
        # (truncated) and is centered with the extra pixel below/right.
        if tw * h < th * w:
            scale = tw / w
            rw, rh = tw, int(h * scale)
        else:
            scale = th / h
            rw, rh = int(w * scale), th
        # Extreme aspect ratios can truncate the scaled short side to 0
        # pixels; the reference crashes inside cv2.resize there
        # (utils.py:334, inv_scale_x > 0 assertion).  Clamp to 1 px and
        # continue — one pathological image must not kill a directory run.
        rw, rh = max(rw, 1), max(rh, 1)
        top, left = (th - rh) // 2, (tw - rw) // 2
        pad = [top, th - rh - top, left, tw - rw - left]

        image = _pad(_resize(image, (rw, rh), upscale), pad, padding_mode)
        img_batch.append(image)
        unscales.append(np.float32(scale))
        paddings.append(np.asarray(pad, np.int64))

    return np.stack(img_batch), np.stack(unscales), np.stack(paddings)


def as_numpy(images) -> np.ndarray | list[np.ndarray]:
    """Device/JAX image batch → host uint8 numpy (N, H, W, 3).

    Counterpart of the reference's ``as_numpy`` (utils.py:170-196), adapted
    to NHWC JAX arrays: passes through numpy inputs, converts device arrays
    (or lists of them) to uint8 host arrays.
    """
    if isinstance(images, list):
        if len(images) == 0 or isinstance(images[0], np.ndarray):
            return images
        return [np.asarray(x).astype(np.uint8) for x in images]
    if isinstance(images, np.ndarray):
        return images
    return np.asarray(images).astype(np.uint8)


def as_device(images, device=None):
    """Host image batch → device array (float32 NHWC).

    Counterpart of the reference's ``as_tensor`` (utils.py:198-226): numpy
    (or ragged lists) become device-resident float32 arrays; already-device
    inputs pass through.
    """
    import jax
    import jax.numpy as jnp

    def put(x):
        arr = jnp.asarray(x, jnp.float32)
        return jax.device_put(arr, device) if device is not None else arr

    if isinstance(images, list):
        if len(images) and not isinstance(images[0], np.ndarray):
            return images
        return [put(x) for x in images]
    if isinstance(images, np.ndarray):
        return put(images)
    return images


def pad_batch_to(batch: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """Pads the leading axis of a batch up to ``n`` by repeating the last row.

    Returns the padded batch and the original (valid) length.  Used to keep
    XLA batch shapes drawn from a fixed bucket set.
    """
    valid = batch.shape[0]
    if valid == n:
        return batch, valid
    if valid > n:
        raise ValueError(f"Batch of {valid} does not fit bucket {n}")
    if valid == 0:
        # Repeating an empty last row keeps the batch empty; pad with zeros
        # so the contract (leading axis == n) holds for empty inputs too.
        return np.zeros((n,) + batch.shape[1:], batch.dtype), 0
    reps = np.repeat(batch[-1:], n - valid, axis=0)
    return np.concatenate([batch, reps], axis=0), valid


def next_pow2(n: int, lo: int = 1) -> int:
    """Smallest power-of-two multiple of ``lo`` that is >= n (>= lo).

    The shared bucketing policy for dynamic counts (faces kept by NMS,
    gated-SR rows, grown detection caps): padding device-program operands to
    power-of-two buckets keeps the number of compiled shapes logarithmic.
    """
    b = lo
    while b < n:
        b *= 2
    return b


def bucket_size(n: int, buckets: tuple[int, ...]) -> int:
    """Smallest bucket >= n; beyond the largest bucket, the next multiple of
    it (so ``pad_batch_to(batch, bucket_size(len(batch), buckets))`` always
    succeeds while the number of distinct shapes stays bounded)."""
    for b in buckets:
        if n <= b:
            return b
    top = buckets[-1]
    return -(-n // top) * top
