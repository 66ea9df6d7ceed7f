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
from ..ops.s2d import space_to_depth, stem_s2d_weight


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

    x = _stage(p, f"{prefix}.layer1", x, 64, 3, stride=1)
    c3 = _stage(p, f"{prefix}.layer2", x, 128, 4, stride=2)
    c4 = _stage(p, f"{prefix}.layer3", c3, 256, 6, stride=2)
    c5 = _stage(p, f"{prefix}.layer4", c4, 512, 3, stride=2)
    return c3, c4, c5
