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
