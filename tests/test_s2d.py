"""Space-to-depth trunk execution: exact-equivalence tests (ops/s2d.py).

The transform claims *mathematical identity* with the plain trunk (not an
approximation), so these tests check tight float32 agreement on CPU:
layout round-trips, single-conv weight-transform equivalence (the core
lemma), concat commutation, whole-forward equivalence, and the enhancer's
gated fallbacks (odd shapes, use_s2d=False).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from face_crop_plus_tpu.models.enhancement import (
    RRDBNet,
    rrdbnet_forward,
    rrdbnet_forward_s2d,
)
from face_crop_plus_tpu.ops.nn import Params, conv2d
from face_crop_plus_tpu.ops.s2d import (
    depth_to_space,
    s2d_bias,
    s2d_conv_weight,
    space_to_depth,
    transform_conv_params,
)


def test_s2d_roundtrip_and_layout():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 8, 5)).astype(np.float32)
    y = space_to_depth(jnp.asarray(x))
    assert y.shape == (2, 3, 4, 20)
    # Sub-minor layout: channel c*4 + (di*2+dj) holds pixel (2i+di, 2j+dj).
    y_np = np.asarray(y)
    for di in (0, 1):
        for dj in (0, 1):
            np.testing.assert_array_equal(
                y_np[:, 1, 2, 3 * 4 + di * 2 + dj], x[:, 2 + di, 4 + dj, 3]
            )
    np.testing.assert_array_equal(np.asarray(depth_to_space(y)), x)


def test_s2d_concat_commutes():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    lhs = space_to_depth(jnp.concatenate([a, b], axis=-1))
    rhs = jnp.concatenate([space_to_depth(a), space_to_depth(b)], axis=-1)
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


def test_s2d_single_conv_equivalence():
    """Core lemma: s2d(conv(x, W)) == conv(s2d(x), W') incl. borders."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 6, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 5)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)

    p = Params({"c.weight": jnp.asarray(w), "c.bias": jnp.asarray(b)})
    y = conv2d(p, "c", jnp.asarray(x), 5, bias=True)

    p2 = Params(
        {"c.weight": jnp.asarray(s2d_conv_weight(w)), "c.bias": jnp.asarray(s2d_bias(b))}
    )
    y2 = conv2d(p2, "c", space_to_depth(jnp.asarray(x)), 20, bias=True)
    np.testing.assert_allclose(
        np.asarray(space_to_depth(y)), np.asarray(y2), rtol=1e-5, atol=1e-5
    )


def _random_params(num_blocks: int) -> dict:
    p = Params(rng=np.random.default_rng(3))
    rrdbnet_forward(p, jnp.zeros((1, 8, 8, 3), jnp.float32), num_blocks)
    return dict(p.data)


def test_s2d_forward_equivalence():
    params = _random_params(num_blocks=2)
    s2d_params = transform_conv_params(
        {
            k: np.asarray(v)
            for k, v in params.items()
            if k.startswith(("RRDB_trunk.", "trunk_conv."))
        }
    )
    x = jnp.asarray(
        np.random.default_rng(4).uniform(size=(2, 10, 14, 3)).astype(np.float32)
    )
    ref = rrdbnet_forward(Params(params), x, 2)
    got = rrdbnet_forward_s2d(
        Params(params), Params({k: jnp.asarray(v) for k, v in s2d_params.items()}), x, 2
    )
    assert got.shape == ref.shape == (2, 40, 56, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw", [(12, 16), (11, 16), (12, 15)])
def test_enhancer_s2d_matches_plain(hw):
    """End-to-end enhance: s2d path (or its odd-shape fallback) == plain."""
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (3, *hw, 3), dtype=np.uint8)
    plain = RRDBNet(num_blocks=2, enh_batch_size=2, use_s2d=False)
    fast = RRDBNet(num_blocks=2, enh_batch_size=2, use_s2d=True)
    a = plain.enhance_images(imgs)
    b = fast.enhance_images(imgs)
    # uint8 round-off: identical math up to accumulation order; allow 1 LSB
    # on a tiny fraction of pixels.
    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_stem_s2d_conv_exact():
    """The 7x7/2 stem conv equals its s2d form (stem_s2d_weight lemma)."""
    import os

    from face_crop_plus_tpu.models.backbones import _stem_conv

    rng = np.random.default_rng(7)
    w = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
    p = Params({"body.conv1.weight": jnp.asarray(w)})
    # Non-square, face-pipeline-flavored even dims + a tiny edge-stress size.
    for shape in ((2, 64, 48, 3), (1, 8, 10, 3)):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        os.environ["FCPT_STEM_MODE"] = "plain"
        try:
            yp = _stem_conv(p, "body", x)
        finally:
            os.environ.pop("FCPT_STEM_MODE")
        ys = _stem_conv(p, "body", x)  # default: s2d2
        assert ys.shape == yp.shape == (shape[0], shape[1] // 2, shape[2] // 2, 64)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yp), atol=2e-4)


def test_stem_s2d_odd_dims_fall_back():
    from face_crop_plus_tpu.models.backbones import _stem_conv

    rng = np.random.default_rng(8)
    w = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
    p = Params({"body.conv1.weight": jnp.asarray(w)})
    x = jnp.asarray(rng.normal(size=(1, 9, 12, 3)).astype(np.float32))
    y = _stem_conv(p, "body", x)  # odd H: direct conv, torch-size output
    assert y.shape == (1, 5, 6, 64)


def test_layer1_ws2d_matches_plain():
    """The ws2d layer1 stage equals the plain stage (s2dw lemma on a full
    bottleneck stack: block-diagonal 1x1s, transformed 3x3s, repeated BN)."""
    import os

    from face_crop_plus_tpu.models.backbones import _layer1
    from face_crop_plus_tpu.ops.nn import init_structure

    rng = np.random.default_rng(11)
    data = init_structure(lambda p, x: _layer1(p, "body", x), (1, 8, 8, 64), 11)
    # Perturb BN from identity so the repeated scale/bias path is exercised.
    for k, v in data.items():
        if k.endswith(".scale"):
            data[k] = rng.uniform(0.5, 1.5, v.shape).astype(np.float32)
        elif k.endswith(".bias"):
            data[k] = rng.normal(0, 0.2, v.shape).astype(np.float32)
    p = Params(data)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 64)).astype(np.float32))
    yp = _layer1(p, "body", x)  # default: plain
    os.environ["FCPT_L1_MODE"] = "ws2d"
    try:
        yw = _layer1(p, "body", x)
    finally:
        os.environ.pop("FCPT_L1_MODE")
    assert yw.shape == yp.shape == (2, 16, 12, 256)
    np.testing.assert_allclose(np.asarray(yw), np.asarray(yp), atol=3e-4)


def test_layer1_ws2d_odd_w_falls_back():
    import os

    from face_crop_plus_tpu.models.backbones import _layer1
    from face_crop_plus_tpu.ops.nn import init_structure

    rng = np.random.default_rng(12)
    data = init_structure(lambda p, x: _layer1(p, "body", x), (1, 8, 8, 64), 12)
    p = Params(data)
    x = jnp.asarray(rng.normal(size=(1, 6, 9, 64)).astype(np.float32))
    os.environ["FCPT_L1_MODE"] = "ws2d"
    try:
        y = _layer1(p, "body", x)  # odd W: plain stage, same output contract
    finally:
        os.environ.pop("FCPT_L1_MODE")
    assert y.shape == (1, 6, 9, 256)


def test_stem_ws2d_block_exact():
    """stem conv+BN+ReLU+pool in W-s2d phase space == the plain stem block
    (stem_ws2d_weight + phase-pool lemma), including the -inf pool edge."""
    import os

    from face_crop_plus_tpu.models.backbones import _stem_block

    rng = np.random.default_rng(21)
    w = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
    p = Params(
        {
            "body.conv1.weight": jnp.asarray(w),
            "body.bn1.scale": jnp.asarray(
                rng.uniform(0.5, 1.5, 64).astype(np.float32)
            ),
            "body.bn1.bias": jnp.asarray(
                rng.normal(0, 0.2, 64).astype(np.float32)
            ),
        }
    )
    # W%4==0 sizes incl. a minimal one that stresses both pad edges.
    for shape in ((2, 64, 48, 3), (1, 8, 8, 3)):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        yp = _stem_block(p, "body", x)  # default: s2d2 + plain pool
        os.environ["FCPT_STEM_MODE"] = "ws2d"
        try:
            yw = _stem_block(p, "body", x)
        finally:
            os.environ.pop("FCPT_STEM_MODE")
        assert yw.shape == yp.shape == (shape[0], shape[1] // 4, shape[2] // 4, 64)
        np.testing.assert_allclose(np.asarray(yw), np.asarray(yp), atol=3e-4)


def test_stem_ws2d_nonmult4_falls_back():
    import os

    from face_crop_plus_tpu.models.backbones import _stem_block

    rng = np.random.default_rng(22)
    p = Params(
        {
            "body.conv1.weight": jnp.asarray(
                rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
            ),
            "body.bn1.scale": jnp.ones(64, np.float32),
            "body.bn1.bias": jnp.zeros(64, np.float32),
        }
    )
    x = jnp.asarray(rng.normal(size=(1, 10, 12, 3)).astype(np.float32))
    os.environ["FCPT_STEM_MODE"] = "ws2d"
    try:
        y = _stem_block(p, "body", x)  # H%4!=0: s2d2/plain fallback
    finally:
        os.environ.pop("FCPT_STEM_MODE")
    assert y.shape == (1, 3, 3, 64)
