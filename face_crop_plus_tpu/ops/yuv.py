"""Device-side YCbCr 4:2:0 packing for JPEG-bound crops.

The reference hands finished crops to ``cv2.imwrite`` (reference
cropper.py:554-609), which converts RGB to YCbCr and 2x2-subsamples the
chroma planes inside libjpeg before entropy coding — every JPEG it writes
is 4:2:0.  On a TPU host the crops must first cross the device→host link,
and on tunneled deployments that link is the pipeline bottleneck (the
fused detect program finishes a 256² crop in ~4.6 ms while its 192 KB of
RGB bytes take ~10 ms at tunnel bandwidth).

Doing the colorspace conversion and chroma subsampling *on device* — the
first two (lossy) stages of the JPEG encoder — shrinks every crop to
1.5 bytes/pixel before it is fetched: 2x less link traffic for byte-wise
the same information the host encoder would have kept anyway.  The host
then feeds the planes straight into libjpeg's raw-data API
(``native/fcpt_io.cpp::fcpt_jpeg_encode_yuv420``), skipping its own
color-convert + downsample pass.

Conversion uses the JFIF/BT.601 full-range matrix (what libjpeg computes
in fixed point); values differ from libjpeg's own conversion by at most
one code level due to rounding order — far below the quantization loss of
the JPEG encode that follows.  Chroma is averaged over 2x2 blocks with
round-half-even (libjpeg's h2v2 downsampler uses an alternating-bias
integer average; again a ≤1-level difference on a lossy stage).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def packed_length(output_size: tuple[int, int]) -> int:
    """Packed bytes per crop for an (width, height) output size."""
    w, h = output_size
    return h * w + 2 * (h // 2) * (w // 2)


def rgb_to_yuv420(crops: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB (F, H, W, 3) → packed planar YCbCr 4:2:0 uint8 (F, L).

    ``L = H*W + 2*(H//2)*(W//2)``: the full-resolution Y plane followed by
    the 2x2-subsampled Cb and Cr planes, each row-major.  H and W must be
    even (callers gate on this; face-crop output sizes are even in
    practice).
    """
    f, h, w, _ = crops.shape
    x = crops.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 + (-0.168735892 * r - 0.331264108 * g + 0.5 * b)
    cr = 128.0 + (0.5 * r - 0.418687589 * g - 0.081312411 * b)
    # Quantize chroma to code levels before subsampling (libjpeg downsamples
    # stored 8-bit samples), then 2x2 average.
    cb = jnp.clip(jnp.rint(cb), 0, 255)
    cr = jnp.clip(jnp.rint(cr), 0, 255)
    cb = cb.reshape(f, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr = cr.reshape(f, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    to_u8 = lambda v: jnp.clip(jnp.rint(v), 0, 255).astype(jnp.uint8)
    return jnp.concatenate(
        [
            to_u8(y).reshape(f, -1),
            to_u8(cb).reshape(f, -1),
            to_u8(cr).reshape(f, -1),
        ],
        axis=1,
    )


def rgb_to_yuv420_np(crops: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`rgb_to_yuv420` (bit-identical float32 math).

    Used for host-resident crops (the staged-path leftovers of a fused
    batch) so one save call can mix device-packed and host-packed rows.
    """
    f, h, w, _ = crops.shape
    x = crops.astype(np.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = np.float32(0.299) * r + np.float32(0.587) * g + np.float32(0.114) * b
    cb = np.float32(128.0) + (
        np.float32(-0.168735892) * r
        - np.float32(0.331264108) * g
        + np.float32(0.5) * b
    )
    cr = np.float32(128.0) + (
        np.float32(0.5) * r
        - np.float32(0.418687589) * g
        - np.float32(0.081312411) * b
    )
    cb = np.clip(np.rint(cb), 0, 255)
    cr = np.clip(np.rint(cr), 0, 255)
    cb = cb.reshape(f, h // 2, 2, w // 2, 2).mean(axis=(2, 4), dtype=np.float32)
    cr = cr.reshape(f, h // 2, 2, w // 2, 2).mean(axis=(2, 4), dtype=np.float32)
    to_u8 = lambda v: np.clip(np.rint(v), 0, 255).astype(np.uint8)
    return np.concatenate(
        [
            to_u8(y).reshape(f, -1),
            to_u8(cb).reshape(f, -1),
            to_u8(cr).reshape(f, -1),
        ],
        axis=1,
    )


def _upsample2x_jnp(c: jnp.ndarray) -> jnp.ndarray:
    """2x chroma upsample with half-pixel centers (triangle filter).

    Output sample i reads chroma coordinate i/2 - 0.25: even outputs blend
    0.75*current + 0.25*previous, odd outputs 0.75*current + 0.25*next
    (edges clamped) — the same weights as libjpeg's "fancy" h2v2
    upsampler, in float.  Applied per axis on (..., H2, W2) arrays.
    """
    for ax in (-2, -1):
        c = jnp.moveaxis(c, ax, -1)
        prev = jnp.concatenate([c[..., :1], c[..., :-1]], axis=-1)
        nxt = jnp.concatenate([c[..., 1:], c[..., -1:]], axis=-1)
        even = 0.75 * c + 0.25 * prev
        odd = 0.75 * c + 0.25 * nxt
        c = jnp.stack([even, odd], axis=-1).reshape(c.shape[:-1] + (-1,))
        c = jnp.moveaxis(c, -1, ax)
    return c


def _upsample2x_np(c: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`_upsample2x_jnp` (bit-identical float32 math)."""
    for ax in (-2, -1):
        c = np.moveaxis(c, ax, -1)
        prev = np.concatenate([c[..., :1], c[..., :-1]], axis=-1)
        nxt = np.concatenate([c[..., 1:], c[..., -1:]], axis=-1)
        even = np.float32(0.75) * c + np.float32(0.25) * prev
        odd = np.float32(0.75) * c + np.float32(0.25) * nxt
        c = np.stack([even, odd], axis=-1).reshape(c.shape[:-1] + (-1,))
        c = np.moveaxis(c, -1, ax)
    return np.ascontiguousarray(c)


def yuv420_to_rgb(packed: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Packed planar YCbCr 4:2:0 (N, L) → uint8 RGB (N, h, w, 3), on device.

    The upload-side inverse of :func:`rgb_to_yuv420`: JPEG sources decode
    straight to their *stored* 4:2:0 samples on the host
    (``native/fcpt_io.cpp::fcpt_decode_jpeg_yuv420`` — entropy decode +
    IDCT only), cross the host→device link at 1.5 bytes/pixel, and this
    function performs the chroma upsample + BT.601 inverse that libjpeg
    would have done on the host.  Pixels match ``cv2.imread`` (which runs
    libjpeg's fixed-point "fancy" upsampler over the same stored samples)
    within ~1 intensity level.
    """
    n = packed.shape[0]
    ylen, clen = h * w, (h // 2) * (w // 2)
    y = packed[:, :ylen].reshape(n, h, w).astype(jnp.float32)
    cb = (
        packed[:, ylen : ylen + clen]
        .reshape(n, h // 2, w // 2)
        .astype(jnp.float32)
    )
    cr = (
        packed[:, ylen + clen :]
        .reshape(n, h // 2, w // 2)
        .astype(jnp.float32)
    )
    cb = _upsample2x_jnp(cb) - 128.0
    cr = _upsample2x_jnp(cr) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.rint(rgb), 0, 255).astype(jnp.uint8)


def yuv420_to_rgb_np(packed: np.ndarray, h: int, w: int) -> np.ndarray:
    """Numpy twin of :func:`yuv420_to_rgb` for host fallbacks.

    Used when a packed-decoded source must take a host path after all
    (staged fallback inside a fused run, odd shapes): identical float32
    expressions, so host and device reconstructions are bit-identical.
    """
    packed = np.asarray(packed)
    squeeze = packed.ndim == 1
    if squeeze:
        packed = packed[None]
    n = packed.shape[0]
    ylen, clen = h * w, (h // 2) * (w // 2)
    y = packed[:, :ylen].reshape(n, h, w).astype(np.float32)
    cb = packed[:, ylen : ylen + clen].reshape(n, h // 2, w // 2).astype(
        np.float32
    )
    cr = packed[:, ylen + clen :].reshape(n, h // 2, w // 2).astype(np.float32)
    cb = _upsample2x_np(cb) - np.float32(128.0)
    cr = _upsample2x_np(cr) - np.float32(128.0)
    r = y + np.float32(1.402) * cr
    g = (
        y
        - np.float32(0.344136286) * cb
        - np.float32(0.714136286) * cr
    )
    b = y + np.float32(1.772) * cb
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return out[0] if squeeze else out


def unpack_yuv420(packed: np.ndarray, output_size: tuple[int, int]):
    """Splits packed (F, L) rows into (y, cb, cr) planes (testing/tooling).

    Returns uint8 arrays of shapes (F, H, W), (F, H/2, W/2), (F, H/2, W/2).
    """
    w, h = output_size
    f = packed.shape[0]
    ylen, clen = h * w, (h // 2) * (w // 2)
    y = packed[:, :ylen].reshape(f, h, w)
    cb = packed[:, ylen : ylen + clen].reshape(f, h // 2, w // 2)
    cr = packed[:, ylen + clen :].reshape(f, h // 2, w // 2)
    return y, cb, cr
