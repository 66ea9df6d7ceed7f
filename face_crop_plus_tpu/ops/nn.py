"""Functional NN primitives for inference-only frozen models.

Design: the three reference networks are frozen pretrained models run
inference-only (reference ``src/face_crop_plus/models/_layers.py:16-25``
freezes all params), so instead of a training framework we use plain
function + parameter-pytree style — the most direct mapping onto jit/pjit:

* Activations are NHWC, conv kernels HWIO (TPU-native layouts).
* Parameters live in a flat ``{name: array}`` dict whose names mirror the
  reference's torch module paths, which makes the ``.pth`` state-dict
  converter (:mod:`face_crop_plus_tpu.models.weights`) a pure tensor-layout
  transform with no rename table.
* BatchNorm is inference-only and pre-folded to a per-channel
  ``scale``/``bias`` pair at conversion time (γ/√(σ²+ε), β−μ·scale) — XLA
  fuses the resulting multiply-add into the producing convolution.
* A :class:`Params` store supports a lazy init mode: running a model's
  apply function once on a tiny input materializes randomly-initialized
  parameters with the exact key set the converter produces, so everything
  stays runnable without the (externally hosted) pretrained weights.
* ``compute_dtype`` (bfloat16 on TPU) applies to conv/matmul inputs with
  float32 accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


class Params:
    """Flat parameter store with optional lazy random initialization.

    In *apply* mode (``rng is None``) missing keys raise.  In *init* mode a
    numpy RNG creates He-normal conv kernels / zero biases / identity BN on
    first access; running the model apply function once (on a tiny input)
    therefore materializes the full parameter dict.
    """

    def __init__(self, data: dict | None = None, rng: np.random.Generator | None = None):
        self.data = {} if data is None else dict(data)
        self.rng = rng

    # -- accessors -----------------------------------------------------

    def _create(self, key: str, shape: tuple[int, ...], kind: str):
        if kind == "conv":
            fan_in = int(np.prod(shape[:3]))
            val = self.rng.normal(size=shape) * np.sqrt(2.0 / fan_in)
        elif kind == "zeros":
            val = np.zeros(shape)
        elif kind == "ones":
            val = np.ones(shape)
        else:  # pragma: no cover
            raise ValueError(kind)
        # Host numpy, not a device array: init-mode params are a structural
        # artifact (converter verification, random-init fallback) and must
        # not pay a host->device transfer each — model constructors upload
        # the final dict once.
        self.data[key] = np.asarray(val, np.float32)

    def get(self, key: str, shape: tuple[int, ...], kind: str) -> jnp.ndarray:
        if key not in self.data:
            if self.rng is None:
                raise KeyError(f"Missing parameter: {key}")
            self._create(key, shape, kind)
        return self.data[key]


def init_structure(forward, input_shape: tuple[int, ...], seed: int, *args) -> dict:
    """Materializes a model's full random-init parameter dict — abstractly.

    Tracing the apply function with :func:`jax.eval_shape` drives every
    :meth:`Params.get` call (creating each weight as host numpy) while
    executing *zero* ops: an eager probe forward would compile ~200 tiny
    one-op programs and, on a remote/tunneled accelerator, pay a round trip
    per op.  ``args`` are extra static arguments after the input batch.
    """
    import jax

    p = Params(rng=np.random.default_rng(seed))
    jax.eval_shape(
        lambda x: forward(p, x, *args),
        jax.ShapeDtypeStruct(input_shape, jnp.float32),
    )
    return dict(p.data)



def conv2d(
    p: Params,
    name: str,
    x: jnp.ndarray,
    features: int,
    kernel: int = 3,
    stride: int = 1,
    padding: int | None = None,
    bias: bool = False,
) -> jnp.ndarray:
    """2D convolution, NHWC x HWIO, torch-compatible explicit padding.

    ``padding=None`` means the torch-style default ``kernel // 2`` ("same"
    for odd kernels at stride 1).
    """
    in_ch = x.shape[-1]
    w = p.get(f"{name}.weight", (kernel, kernel, in_ch, features), "conv")
    pad = kernel // 2 if padding is None else padding
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias:
        b = p.get(f"{name}.bias", (features,), "zeros")
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Inference BatchNorm folded to scale/bias (see module docstring)."""
    c = x.shape[-1]
    scale = p.get(f"{name}.scale", (c,), "ones")
    bias = p.get(f"{name}.bias", (c,), "zeros")
    return (x * scale.astype(x.dtype) + bias.astype(x.dtype)).astype(x.dtype)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.0) -> jnp.ndarray:
    if negative_slope == 0.0:
        return jax.nn.relu(x)
    return jnp.where(x >= 0, x, x * negative_slope)


def max_pool(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """Max pooling with torch-style explicit symmetric padding."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pooling to (N, 1, 1, C) with f32 accumulation."""
    y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    return y.astype(x.dtype)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Torch-legacy ``F.interpolate(mode="nearest")``: src = floor(i*in/out).

    Implemented as two axis gathers (exact index parity with torch, unlike
    ``jax.image.resize`` which uses half-pixel centers).
    """
    h, w = x.shape[1], x.shape[2]
    oh, ow = size
    iy = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def _linear_resize_matrix(
    n_in: int, n_out: int, align_corners: bool, pad: tuple[int, int] = (0, 0)
) -> np.ndarray:
    """Dense (n_out, n_in) bilinear interpolation matrix (one axis).

    Expressing resize as a matmul maps it onto the MXU — the TPU-native way
    to do the fixed 64→512 upsample inside BiSeNet (align_corners=True,
    which ``jax.image.resize`` does not support) and the 512-px model input
    resize.

    ``pad`` embeds (before, after) rows of zeros around the interpolation
    rows, folding a zero-``jnp.pad`` of the resized output into the same
    matmul — one HBM round trip instead of two (resize buffer + pad buffer).
    """
    if pad != (0, 0):
        m = _linear_resize_matrix(n_in, n_out, align_corners)
        out = np.zeros((pad[0] + n_out + pad[1], n_in), dtype=np.float32)
        out[pad[0] : pad[0] + n_out] = m
        return out
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    if align_corners:
        # torch uses scale (n_in-1)/(n_out-1), which degenerates to 0 for a
        # single output sample: the corner pixel, not the center.
        scale_ac = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        src = np.arange(n_out, dtype=np.float64) * scale_ac
    else:
        scale = n_in / n_out
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float64)
    m = np.zeros((n_out, n_in), dtype=np.float32)
    m[np.arange(n_out), lo] += (1.0 - frac).astype(np.float32)
    m[np.arange(n_out), hi] += frac.astype(np.float32)
    return m


def resize_bilinear(
    x: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool = False,
    pad: tuple[tuple[int, int], tuple[int, int]] | None = None,
) -> jnp.ndarray:
    """Separable bilinear resize as two MXU matmuls (torch-parity sampling).

    Matches ``F.interpolate(mode="bilinear", align_corners=...)`` for both
    corner conventions.  ``pad`` = ((top, bottom), (left, right)) appends
    zero borders around the resized image inside the same matmuls —
    identical to a following ``jnp.pad`` without materializing the unpadded
    intermediate.
    """
    h, w = x.shape[1], x.shape[2]
    oh, ow = size
    py, px = pad if pad is not None else ((0, 0), (0, 0))
    my = jnp.asarray(_linear_resize_matrix(h, oh, align_corners, tuple(py)))
    mx = jnp.asarray(_linear_resize_matrix(w, ow, align_corners, tuple(px)))
    y = jnp.einsum(
        "oh,nhwc->nowc", my.astype(x.dtype), x, preferred_element_type=jnp.float32
    )
    y = jnp.einsum(
        "pw,nhwc->nhpc", mx.astype(x.dtype), y.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x nearest upsampling (pixel replication)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


# Fixed 4-tap filter: torch bicubic (a=-0.75) downscale by exactly 4x with
# align_corners=False reduces to this separable stride-4 filter — sample
# positions land at constant fractional offsets (±0.5, ±1.5), fully interior.
_BICUBIC_DOWN4_TAPS = np.array([-0.09375, 0.59375, 0.59375, -0.09375], np.float32)


def downscale4x_bicubic(x: jnp.ndarray) -> jnp.ndarray:
    """Exact torch-parity bicubic x0.25 downscale (the SR model's ×4 undo).

    Reference rrdb.py:143 (``F.interpolate(image_x4, None, 0.25, "bicubic")``).
    Implemented as a reshape + two tensordots (VPU-friendly, no gather).
    """
    n, h, w, c = x.shape
    taps = jnp.asarray(_BICUBIC_DOWN4_TAPS, x.dtype)
    y = x.reshape(n, h // 4, 4, w, c)
    y = jnp.einsum("nhtwc,t->nhwc", y, taps, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype).reshape(n, h // 4, w // 4, 4, c)
    y = jnp.einsum("nhwtc,t->nhwc", y, taps, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)
