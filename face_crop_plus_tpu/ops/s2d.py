"""Space-to-depth execution for 3x3 stride-1 convolution stacks.

Motivation (SURVEY.md §7 / STATUS known-gap #1): the RRDB trunk's convs
output 32-64 channels, which caps MXU utilization at 1/4-1/2 of the 128-wide
systolic array no matter how XLA tiles them.  Executing the trunk in
space-to-depth form — half spatial resolution, 4x the channels — lifts the
conv output widths to 128-256 lanes.  The cost is 4x nominal FLOPs (the
transformed kernels are 75% structural zeros, stored dense).

Measured outcome (TPU v5e, 512², 23-block trunk, bf16): the s2d trunk
sustains ~4x the plain trunk's MXU FLOP/s (60 vs 15 TF/s) at *identical*
wall time — i.e. the utilization gain exactly pays for the FLOP inflation,
and the trunk's runtime is NOT bound by conv output width.  (A concat-free
weight-split variant was also measured at only ~10% faster, ruling out
concat materialization as the dominant cost.)  The implementation is kept
because it is exact, tested, and the right building block if a future
Mosaic/XLA version shifts the balance; ``RRDBNet(use_s2d=True)`` enables it.

Equivalence (exact, not approximate): pick the *sub-minor interleaved*
layout ``x'[n, i, j, c*4 + (di*2 + dj)] = x[n, 2i+di, 2j+dj, c]``.  Under
this layout

* channel-concatenation commutes with the transform
  (``s2d(concat(a, b)) == concat(s2d(a), s2d(b))``),
* elementwise ops and residual adds commute trivially, and
* a 3x3 stride-1 zero-pad-1 conv ``y = conv(x, W)`` maps to a 3x3 stride-1
  zero-pad-1 conv in s2d space, ``s2d(y) = conv(s2d(x), W')``, where
  ``W'[P+1, Q+1, ci*4 + si, co*4 + so] = W[u+1, v+1, ci, co]`` with
  ``u = 2P + si_r - so_r`` and ``v = 2Q + si_c - so_c`` when those fall in
  ``[-1, 1]`` and zero otherwise.  (Output row ``2i + so_r`` reads input row
  ``2i + so_r + u``, which in s2d coordinates is block-row ``i + P``,
  sub-row ``si_r``.)  Zero padding is also exact for even ``H, W``: the
  padded s2d border rows correspond to original rows ``-2, -1`` and
  ``H, H+1``, and the out-of-range ones (``-2``, ``H+1``) only ever meet
  structurally-zero weights.

So an entire dense-block trunk (convs + leaky-relu + concats + scaled
residuals) runs in s2d space with only its conv weights transformed —
one host-side pass at load time — bracketed by one ``space_to_depth`` /
``depth_to_space`` pair.  Requires even spatial dims; callers fall back to
the plain trunk otherwise.

No counterpart exists in the reference (its torch convs run as cuDNN
dispatches them); this is a TPU-specific execution strategy for the RRDB
trunk of ``src/face_crop_plus/models/rrdb.py``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) → (N, H/2, W/2, 4C), sub-minor interleaved layout."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (n, i, j, c, di, dj)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    n, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h2, w2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (n, i, di, j, dj, c)
    return x.reshape(n, 2 * h2, 2 * w2, c)


def s2d_conv_weight(w: np.ndarray) -> np.ndarray:
    """(3, 3, Cin, Cout) HWIO kernel → its (3, 3, 4Cin, 4Cout) s2d form."""
    assert w.shape[:2] == (3, 3), w.shape
    ci, co = w.shape[2], w.shape[3]
    out = np.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for so_r in (0, 1):
        for so_c in (0, 1):
            so = so_r * 2 + so_c
            for p_r in (-1, 0, 1):
                for si_r in (0, 1):
                    u = 2 * p_r + si_r - so_r
                    if not -1 <= u <= 1:
                        continue
                    for p_c in (-1, 0, 1):
                        for si_c in (0, 1):
                            v = 2 * p_c + si_c - so_c
                            if not -1 <= v <= 1:
                                continue
                            si = si_r * 2 + si_c
                            out[p_r + 1, p_c + 1, si::4, so::4] = w[u + 1, v + 1]
    return out


def s2d_bias(b: np.ndarray) -> np.ndarray:
    """(Cout,) bias → (4Cout,): b'[c*4 + s] = b[c]."""
    return np.repeat(b, 4)


def stem_s2d_weight(w) -> jnp.ndarray:
    """(7, 7, Cin, Cout) stride-2 pad-3 stem kernel → (4, 4, 4Cin, Cout).

    The ResNet stem ``y[i,j] = Σ_{dy,dx∈[-3,3]} W[dy+3, dx+3] · x[2i+dy,
    2j+dx]`` (stride 2, zero-pad 3) is exactly a stride-1 conv on the
    :func:`space_to_depth` input: with ``dy = 2(k-2) + a`` (``k`` the s2d
    kernel row, ``a`` the sub-row) the taps regroup as
    ``W'[k, kx, c*4 + a*2 + b, o] = W[2k+a-4+3, 2kx+b-4+3, c, o]`` (zero
    where the index leaves [0, 7)), applied with asymmetric zero padding
    ((2, 1), (2, 1)) on the half-resolution grid.

    Why: the raw stem convolves 3 input channels — 3/128 lane packing and
    ~12x overlapping input reads make it one of the slowest ops in the
    detector per FLOP (measured: 0.68 ms/img of a 3.9 ms/img program,
    tools/detect_stage_times.py).  The s2d form reads each input pixel
    ~4x through 12 channels.  16·12 = 192 taps vs 49·3 = 147 → 1.3x nominal
    FLOPs, irrelevant at 3.7% MFU.  Exact for even H, W: the out-of-range
    original rows (−4, H+1 side analog) only ever meet structural zeros.
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (7, 7), w.shape
    wp = jnp.pad(jnp.asarray(w), ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(4, 2, 4, 2, ci, co).transpose(0, 2, 4, 1, 3, 5)
    return w2.reshape(4, 4, 4 * ci, co)


def stem_ws2d_weight(w) -> jnp.ndarray:
    """(7, 7, Cin, Cout) stem → (4, 3, 8Cin, 2Cout): s2d2 input with W-blocks
    paired (channels b·4Cin + c), output in W-s2d layout (channels o·2+so).

    Composition of :func:`stem_s2d_weight` with a W-pairing of both sides:
    ``y'[i, j, o*2+so] = y_s2d2[i, 2j+so, o]``, and the s2d2 conv reads
    s2d2 block ``B = 2j + so + kx - 2`` (pad (2,1)) = pair ``j + Q``,
    sub-block ``b`` with ``(Q, b) = divmod(so + kx - 2, 2)``; pair padding
    (1, 1).  Pair −1 / pair W/4 cover original columns −4..−1 /
    W..W+3 — each either structural zeros or the conv's own zero padding,
    so the form is exact for ``W % 4 == 0``.  Why: the s2d2 stem's 64
    output channels fill half the 128 MXU/vreg lanes; the W-s2d output
    doubles the lanes at identical FLOPs (measured 1.00 vs 1.18 ms/img
    conv-only, tools/stem_probe.py).
    """
    w2 = stem_s2d_weight(w)  # (4, 4, 4Cin, Cout)
    ci, co = w2.shape[2], w2.shape[3]
    out = jnp.zeros((4, 3, 2 * ci, 2 * co), w2.dtype)
    for so in (0, 1):
        for kx in range(4):
            q, b = divmod(so + kx - 2, 2)
            out = out.at[:, q + 1, b * ci : (b + 1) * ci, so::2].set(w2[:, kx])
    return out


def space_to_depth_w(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) → (N, H, W/2, 2C), W-axis sub-minor interleaved layout
    ``x'[n, h, j, c*2 + dj] = x[n, h, 2j + dj, c]``.

    The W-only transform is the production sweet spot for the RRDB trunk
    (measured on TPU v5e, see STATUS.md): it doubles every channel count —
    64 packs the 128-lane HBM tile exactly, so the trunk's padded-lane
    write/read amplification disappears — at only 2x nominal FLOPs, versus
    4x for the full (H and W) transform above.  Requires even W only.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h, w // 2, 2, c)
    return x.transpose(0, 1, 2, 4, 3).reshape(n, h, w // 2, 2 * c)


def depth_to_space_w(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth_w`."""
    n, h, w2, c2 = x.shape
    x = x.reshape(n, h, w2, c2 // 2, 2)
    return x.transpose(0, 1, 2, 4, 3).reshape(n, h, w2 * 2, c2 // 2)


def s2dw_conv_weight(w: np.ndarray) -> np.ndarray:
    """(3, 3, Cin, Cout) HWIO kernel → its (3, 3, 2Cin, 2Cout) W-s2d form.

    Same derivation as :func:`s2d_conv_weight` restricted to the W axis:
    ``W'[u, Q+1, ci*2+si, co*2+so] = W[u, v+1, ci, co]`` with
    ``v = 2Q + si - so`` kept when it falls in ``[-1, 1]`` (output
    sub-column ``so`` at block-column ``j`` reads original column
    ``2j + so + v``, which is block-column ``j + Q``, sub-column ``si``).
    Zero padding stays exact for even W: padded block-column ``-1`` holds
    original columns ``-2, -1`` and ``-2`` only meets structural zeros.
    """
    assert w.shape[:2] == (3, 3), w.shape
    ci, co = w.shape[2], w.shape[3]
    out = np.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for q in (-1, 0, 1):
        for si in (0, 1):
            for so in (0, 1):
                v = 2 * q + si - so
                if -1 <= v <= 1:
                    out[:, q + 1, si::2, so::2] = w[:, v + 1]
    return out


def s2dw_bias(b: np.ndarray) -> np.ndarray:
    """(Cout,) bias → (2Cout,): b'[c*2 + s] = b[c]."""
    return np.repeat(b, 2)


def s2dw_conv3_weight_j(w: jnp.ndarray) -> jnp.ndarray:
    """Traceable :func:`s2dw_conv_weight`: (3, 3, Ci, Co) → (3, 3, 2Ci, 2Co).

    Same mapping (``W'[k, q+1, ci*2+si, co*2+so] = W[k, v+1]``,
    ``v = 2q + si - so`` kept in ``[-1, 1]``) built from stacks/reshapes so
    it can run on the in-jit parameter tensors — the transformed kernels are
    a few hundred KB, so re-deriving them per call is noise next to the
    convs they feed.
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3), w.shape
    z = jnp.zeros((kh, ci, co), w.dtype)
    cols = []
    for q in (-1, 0, 1):
        sis = []
        for si in (0, 1):
            sos = []
            for so in (0, 1):
                v = 2 * q + si - so
                sos.append(w[:, v + 1] if -1 <= v <= 1 else z)
            sis.append(jnp.stack(sos, 0))
        cols.append(jnp.stack(sis, 0))
    t = jnp.stack(cols, 0)  # (q, si, so, kh, ci, co)
    t = t.transpose(3, 0, 4, 1, 5, 2)  # (kh, q, ci, si, co, so)
    return t.reshape(kh, 3, 2 * ci, 2 * co)


def s2dw_conv1_weight_j(w: jnp.ndarray) -> jnp.ndarray:
    """Traceable 1x1 W-s2d form: block-diagonal (1, 1, 2Ci, 2Co).

    A 1x1 conv acts on each sub-column independently, so ``si == so``:
    ``W'[0, 0, ci*2+s, co*2+s] = W[0, 0, ci, co]``.
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (1, 1), w.shape
    z = jnp.zeros_like(w)
    t = jnp.stack([jnp.stack([w, z], 0), jnp.stack([z, w], 0)], 0)
    # (si, so, 1, 1, ci, co) → (1, 1, ci, si, co, so)
    t = t.transpose(2, 3, 4, 0, 5, 1)
    return t.reshape(1, 1, 2 * ci, 2 * co)


def transform_conv_params(params: dict) -> dict:
    """Returns s2d-transformed copies of every ``*.weight``/``*.bias`` entry.

    The caller passes the (pre-filtered) 3x3-conv parameters of the stack to
    transform; the result keeps the original key names so the same apply
    function can run against either parameter dict.
    """
    out = {}
    for key, val in params.items():
        arr = np.asarray(val)
        if key.endswith(".weight"):
            out[key] = s2d_conv_weight(arr)
        elif key.endswith(".bias"):
            out[key] = s2d_bias(arr)
        else:  # pragma: no cover - conv stacks have only weight/bias params
            raise ValueError(f"unexpected conv-stack parameter: {key}")
    return out
