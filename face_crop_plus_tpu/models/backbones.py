"""Backbone feature extractors (functional, NHWC).

``resnet50_features`` reproduces the torchvision ResNet-50 trunk the
reference detector builds via ``IntermediateLayerGetter``
(``src/face_crop_plus/models/retinaface.py:93-99``), returning the C3/C4/C5
pyramid (layer2/3/4 outputs).  Parameter names mirror torchvision module
paths (under the caller's prefix, e.g. ``body.layer1.0.conv1.weight``) so
the pretrained checkpoint converts mechanically.

Architecture facts encoded below (standard torchvision ResNet v1.5):
7x7/2 stem + 3x3/2 maxpool; bottleneck blocks with expansion 4 and the
stride on the 3x3 conv; stage widths 64/128/256/512 with depths 3/4/6/3.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from ..ops.nn import Params, batch_norm, conv2d, leaky_relu, max_pool
from ..ops.s2d import (
    s2dw_conv1_weight_j,
    s2dw_conv3_weight_j,
    space_to_depth,
    space_to_depth_w,
    depth_to_space_w,
    stem_s2d_weight,
    stem_ws2d_weight,
)


def _bottleneck(
    p: Params, name: str, x: jnp.ndarray, width: int, stride: int, project: bool
) -> jnp.ndarray:
    """Torchvision Bottleneck: 1x1 → 3x3(stride) → 1x1(×4) + identity."""
    out = conv2d(p, f"{name}.conv1", x, width, kernel=1, padding=0)
    out = leaky_relu(batch_norm(p, f"{name}.bn1", out))
    out = conv2d(p, f"{name}.conv2", out, width, kernel=3, stride=stride)
    out = leaky_relu(batch_norm(p, f"{name}.bn2", out))
    out = conv2d(p, f"{name}.conv3", out, width * 4, kernel=1, padding=0)
    out = batch_norm(p, f"{name}.bn3", out)

    if project:
        identity = conv2d(
            p, f"{name}.downsample.0", x, width * 4, kernel=1, stride=stride, padding=0
        )
        identity = batch_norm(p, f"{name}.downsample.1", identity)
    else:
        identity = x
    return leaky_relu(out + identity)


def _stage(
    p: Params, name: str, x: jnp.ndarray, width: int, depth: int, stride: int
) -> jnp.ndarray:
    x = _bottleneck(p, f"{name}.0", x, width, stride, project=True)
    for i in range(1, depth):
        x = _bottleneck(p, f"{name}.{i}", x, width, 1, project=False)
    return x


def _conv_ws2d(
    p: Params, name: str, x: jnp.ndarray, features: int, kernel: int
) -> jnp.ndarray:
    """Stride-1 conv on a W-s2d activation with checkpoint-shape weights.

    Fetches the ordinary ``(k, k, Ci, Co)`` kernel and applies its W-s2d
    form (see :mod:`..ops.s2d`), so parameter shapes stay identical across
    execution modes.
    """
    ci = x.shape[-1] // 2
    w = p.get(f"{name}.weight", (kernel, kernel, ci, features), "conv")
    w = jnp.asarray(w)
    w2 = (
        s2dw_conv3_weight_j(w) if kernel == 3 else s2dw_conv1_weight_j(w)
    ).astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        w2,
        window_strides=(1, 1),
        padding=((kernel // 2, kernel // 2), (kernel // 2, kernel // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def _bn_ws2d(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Folded BN on a W-s2d activation (per-channel params repeated x2)."""
    c = x.shape[-1] // 2
    scale = jnp.repeat(jnp.asarray(p.get(f"{name}.scale", (c,), "ones")), 2)
    bias = jnp.repeat(jnp.asarray(p.get(f"{name}.bias", (c,), "zeros")), 2)
    return (x * scale.astype(x.dtype) + bias.astype(x.dtype)).astype(x.dtype)


def _bottleneck_ws2d(
    p: Params, name: str, x: jnp.ndarray, width: int, project: bool
) -> jnp.ndarray:
    """Stride-1 torchvision Bottleneck executed in W-s2d space.

    Why: layer1's 64-channel 3x3 convs fill half the 128-wide MXU/vreg
    lanes; measured at 256² they run at ~20% MFU and are the largest single
    stage of the fused detect program (tools/detect_stage_times.py).  The
    W-only transform doubles channels (64 → 128 packs lanes exactly) at 2x
    nominal FLOPs for the 3x3s and zero extra FLOPs structurally for the
    block-diagonal 1x1s.  Elementwise ops and residual adds commute with
    the layout.
    """
    out = _conv_ws2d(p, f"{name}.conv1", x, width, kernel=1)
    out = leaky_relu(_bn_ws2d(p, f"{name}.bn1", out))
    out = _conv_ws2d(p, f"{name}.conv2", out, width, kernel=3)
    out = leaky_relu(_bn_ws2d(p, f"{name}.bn2", out))
    out = _conv_ws2d(p, f"{name}.conv3", out, width * 4, kernel=1)
    out = _bn_ws2d(p, f"{name}.bn3", out)

    if project:
        identity = _conv_ws2d(p, f"{name}.downsample.0", x, width * 4, kernel=1)
        identity = _bn_ws2d(p, f"{name}.downsample.1", identity)
    else:
        identity = x
    return leaky_relu(out + identity)


def _layer1(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """layer1 (3 stride-1 bottlenecks); ``FCPT_L1_MODE=ws2d`` opts in to
    W-s2d execution.

    Measured (TPU v5e, 1024², batch 16, tools/detect_traffic.py): ws2d is a
    *negative* lever here — 3.61 vs 3.20 ms/img for the fused detect
    program.  The bracketing transposes add ~1.1 GB/batch of copy traffic
    and the 3x3 FLOPs double, while the plain stage's 43 TF/s turns out not
    to be lane-bound (unlike the SR trunk, where ws2d is the production
    mode).  Kept as an exact, tested execution strategy; default plain.
    """
    name = f"{prefix}.layer1"
    mode = os.environ.get("FCPT_L1_MODE", "plain")
    if mode != "ws2d" or x.shape[2] % 2:
        return _stage(p, name, x, 64, 3, stride=1)
    x = space_to_depth_w(x)
    x = _bottleneck_ws2d(p, f"{name}.0", x, 64, project=True)
    x = _bottleneck_ws2d(p, f"{name}.1", x, 64, project=False)
    x = _bottleneck_ws2d(p, f"{name}.2", x, 64, project=False)
    return depth_to_space_w(x)


def _stem_conv(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """The 7x7/2 stem conv, by default in space-to-depth form.

    The raw stem convolves 3 input channels — 3/128 lane packing plus ~12x
    overlapping reads make it ~17% of detector runtime at 3.7% MFU
    (tools/detect_stage_times.py).  :func:`stem_s2d_weight` documents the
    exact stride-1 reformulation on the s2d input.  ``FCPT_STEM_MODE=plain``
    restores the direct conv; odd spatial dims always fall back.
    """
    ci = x.shape[-1]
    # Checkpoint-stable parameter shape regardless of execution mode.
    w = p.get(f"{prefix}.conv1.weight", (7, 7, ci, 64), "conv")
    mode = os.environ.get("FCPT_STEM_MODE", "s2d2")
    if mode == "plain" or x.shape[1] % 2 or x.shape[2] % 2:
        return lax.conv_general_dilated(
            x,
            jnp.asarray(w).astype(x.dtype),
            window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    w2 = stem_s2d_weight(w).astype(x.dtype)
    y = lax.conv_general_dilated(
        space_to_depth(x),
        w2,
        window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def _stem_ws2d(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """Stem conv + BN + ReLU + 3x3/2 maxpool, entirely in W-s2d phase space.

    The conv emits the W-s2d layout directly (:func:`stem_ws2d_weight` —
    128 output lanes instead of 64, measured 1.00 vs 1.18 ms/img conv-only
    on TPU v5e); BN/ReLU commute (params repeated x2); the W half of the
    maxpool runs as phase arithmetic so no full-resolution transpose is
    ever materialized — only the pooled (H/4, W/8, 128) tensor converts
    back.  *Negative in-program*: the fused detect program measures
    3.77 vs 3.19 ms/img (tools/detect_traffic.py `stem_ws2d`) — the
    phase-pool's strided even/odd slices cost more than the isolated conv
    win; kept as an exact, tested opt-in (``FCPT_STEM_MODE=ws2d``),
    default stays ``s2d2``.  Pool-output column ``m = 2j + s`` covers stem columns
    ``2m-1..2m+1``; splitting stem blocks into even/odd (B0/B1) and phases
    (P0/P1):  ``out_s0[j] = max(B1P1[j-1], B0P0[j], B0P1[j])`` and
    ``out_s1[j] = max(B0P1[j], B1P0[j], B1P1[j])``.  Exact for
    H % 4 == W % 4 == 0 (callers fall back otherwise).
    """
    ci = x.shape[-1]
    w = p.get(f"{prefix}.conv1.weight", (7, 7, ci, 64), "conv")
    ww = stem_ws2d_weight(jnp.asarray(w)).astype(x.dtype)
    xs = space_to_depth(x)  # (N, H/2, W/2, 4Ci)
    n, h2, w2, c = xs.shape
    x2 = xs.reshape(n, h2, w2 // 2, 2 * c)  # pair W-blocks: b*4Ci + c
    y = lax.conv_general_dilated(
        x2,
        ww,
        window_strides=(1, 1),
        padding=((2, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (N, H/2, W/4, 128), channels o*2+so

    scale = jnp.repeat(jnp.asarray(p.get(f"{prefix}.bn1.scale", (64,), "ones")), 2)
    bias = jnp.repeat(jnp.asarray(p.get(f"{prefix}.bn1.bias", (64,), "zeros")), 2)
    y = leaky_relu((y * scale.astype(y.dtype) + bias.astype(y.dtype)))

    # H half of the 3x3/2 maxpool (standard axis), W half in phase space.
    y = lax.reduce_window(
        y, -jnp.inf, lax.max,
        window_dimensions=(1, 3, 1, 1), window_strides=(1, 2, 1, 1),
        padding=((0, 0), (1, 1), (0, 0), (0, 0)),
    )  # (N, H/4, W/4, 128)
    a = y.reshape(*y.shape[:3], 64, 2)  # [..., o, p]
    b0, b1 = a[:, :, 0::2], a[:, :, 1::2]  # even/odd stem blocks
    ninf = jnp.array(-jnp.inf, y.dtype)
    b1p1_shift = jnp.concatenate(
        [jnp.full_like(b1[:, :, :1, :, 1], ninf), b1[:, :, :-1, :, 1]], axis=2
    )
    out_s0 = jnp.maximum(jnp.maximum(b1p1_shift, b0[..., 0]), b0[..., 1])
    out_s1 = jnp.maximum(jnp.maximum(b0[..., 1], b1[..., 0]), b1[..., 1])
    z = jnp.stack([out_s0, out_s1], axis=-1)  # (N, H/4, W/8, 64, 2)
    z = z.reshape(*z.shape[:3], 128)
    return depth_to_space_w(z)  # (N, H/4, W/4, 64)


def _stem_block(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """Stem conv + BN + ReLU + maxpool, dispatched by ``FCPT_STEM_MODE``."""
    mode = os.environ.get("FCPT_STEM_MODE", "s2d2")
    if mode == "ws2d" and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
        return _stem_ws2d(p, prefix, x)
    x = _stem_conv(p, prefix, x)
    x = leaky_relu(batch_norm(p, f"{prefix}.bn1", x))
    return max_pool(x, window=3, stride=2, padding=1)


def resnet50_features(
    p: Params, prefix: str, x: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Runs the ResNet-50 trunk, returning (C3, C4, C5) feature maps.

    Args:
        p: Parameter store.
        prefix: Name prefix (the reference uses ``body``).
        x: (N, H, W, 3) input in detector preprocessing space.

    Returns:
        Features at strides 8/16/32 with 512/1024/2048 channels.
    """
    x = _stem_block(p, prefix, x)
    x = _layer1(p, prefix, x)
    c3 = _stage(p, f"{prefix}.layer2", x, 128, 4, stride=2)
    c4 = _stage(p, f"{prefix}.layer3", c3, 256, 6, stride=2)
    c5 = _stage(p, f"{prefix}.layer4", c4, 512, 3, stride=2)
    return c3, c4, c5
