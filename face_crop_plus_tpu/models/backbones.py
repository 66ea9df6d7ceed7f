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
    x = _stem_conv(p, prefix, x)
    x = leaky_relu(batch_norm(p, f"{prefix}.bn1", x))
    x = max_pool(x, window=3, stride=2, padding=1)

    x = _layer1(p, prefix, x)
    c3 = _stage(p, f"{prefix}.layer2", x, 128, 4, stride=2)
    c4 = _stage(p, f"{prefix}.layer3", c3, 256, 6, stride=2)
    c5 = _stage(p, f"{prefix}.layer4", c4, 512, 3, stride=2)
    return c3, c4, c5
