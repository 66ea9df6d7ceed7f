"""Parity tests: functional NN primitives + weight converter vs torch.

These validate the exact semantics the pretrained-weight conversion relies
on: conv padding/stride/layout, folded inference BatchNorm (eps=1e-5),
leaky ReLU, max pooling, and all four interpolation variants used by the
reference models.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from face_crop_plus_tpu.models.weights import convert_state_dict  # noqa: E402
from face_crop_plus_tpu.ops.nn import (  # noqa: E402
    Params,
    batch_norm,
    conv2d,
    downscale4x_bicubic,
    global_avg_pool,
    leaky_relu,
    max_pool,
    resize_bilinear,
    resize_nearest,
    upsample2x_nearest,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize(
    "kernel,stride,padding,bias",
    [(3, 1, None, False), (1, 1, 0, True), (7, 2, 3, False), (3, 2, None, True)],
)
def test_conv2d_matches_torch(rng, kernel, stride, padding, bias):
    x = rng.normal(size=(2, 16, 20, 5)).astype(np.float32)
    tconv = tnn.Conv2d(5, 7, kernel, stride, kernel // 2 if padding is None else padding, bias=bias)
    params = convert_state_dict({f"m.{k}": v for k, v in tconv.state_dict().items()})
    p = Params({k: jnp.asarray(v) for k, v in params.items()})

    ours = np.asarray(conv2d(p, "m", jnp.asarray(x), 7, kernel, stride, padding, bias))
    ref = _to_nhwc(tconv(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_batch_norm_folding_matches_torch(rng):
    x = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
    tbn = tnn.BatchNorm2d(6).eval()
    # Non-trivial running stats.
    with torch.no_grad():
        tbn.running_mean.copy_(torch.from_numpy(rng.normal(size=6).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 2, 6).astype(np.float32)))
        tbn.weight.copy_(torch.from_numpy(rng.normal(size=6).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.normal(size=6).astype(np.float32)))
    params = convert_state_dict({f"bn.{k}": v for k, v in tbn.state_dict().items()})
    assert set(params) == {"bn.scale", "bn.bias"}
    p = Params({k: jnp.asarray(v) for k, v in params.items()})

    ours = np.asarray(batch_norm(p, "bn", jnp.asarray(x)))
    ref = _to_nhwc(tbn(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv_bn_lrelu_stack(rng):
    # The reference's ubiquitous conv_bn block (_layers.py:77-88).
    x = rng.normal(size=(1, 12, 12, 4)).astype(np.float32)
    tm = tnn.Sequential(
        tnn.Conv2d(4, 8, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(8),
        tnn.LeakyReLU(0.1),
    ).eval()
    with torch.no_grad():
        tm[1].running_mean.copy_(torch.randn(8))
        tm[1].running_var.copy_(torch.rand(8) + 0.5)
    params = convert_state_dict({f"blk.{k}": v for k, v in tm.state_dict().items()})
    p = Params({k: jnp.asarray(v) for k, v in params.items()})

    y = conv2d(p, "blk.0", jnp.asarray(x), 8, 3)
    y = batch_norm(p, "blk.1", y)
    y = leaky_relu(y, 0.1)
    ref = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5)


def test_max_pool_matches_torch(rng):
    x = rng.normal(size=(2, 17, 13, 3)).astype(np.float32)
    ours = np.asarray(max_pool(jnp.asarray(x), 3, 2, 1))
    ref = _to_nhwc(tF.max_pool2d(_nchw(x), 3, 2, 1))
    np.testing.assert_allclose(ours, ref, atol=0)


def test_global_avg_pool(rng):
    x = rng.normal(size=(2, 9, 7, 4)).astype(np.float32)
    ours = np.asarray(global_avg_pool(jnp.asarray(x)))
    assert ours.shape == (2, 1, 1, 4)
    np.testing.assert_allclose(ours[:, 0, 0], x.mean(axis=(1, 2)), atol=1e-5)


@pytest.mark.parametrize("size", [(16, 16), (7, 9), (30, 11)])
def test_resize_nearest_matches_torch(rng, size):
    x = rng.normal(size=(2, 15, 10, 3)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), size))
    ref = _to_nhwc(tF.interpolate(_nchw(x), size=size, mode="nearest"))
    np.testing.assert_allclose(ours, ref, atol=0)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("size", [(32, 32), (13, 21)])
def test_resize_bilinear_matches_torch(rng, align, size):
    x = rng.normal(size=(2, 16, 12, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners=align))
    ref = _to_nhwc(
        tF.interpolate(_nchw(x), size=size, mode="bilinear", align_corners=align)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample2x_nearest_matches_torch(rng):
    x = rng.normal(size=(1, 6, 5, 2)).astype(np.float32)
    ours = np.asarray(upsample2x_nearest(jnp.asarray(x)))
    ref = _to_nhwc(tF.interpolate(_nchw(x), scale_factor=2, mode="nearest"))
    np.testing.assert_allclose(ours, ref, atol=0)


def test_downscale4x_bicubic_matches_torch(rng):
    # The SR model's exact x0.25 undo (rrdb.py:143).
    x = rng.uniform(0, 1, size=(1, 32, 48, 3)).astype(np.float32)
    ours = np.asarray(downscale4x_bicubic(jnp.asarray(x)))
    ref = _to_nhwc(tF.interpolate(_nchw(x), scale_factor=0.25, mode="bicubic"))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_converter_drops_num_batches_tracked():
    tbn = tnn.BatchNorm2d(3)
    params = convert_state_dict({f"b.{k}": v for k, v in tbn.state_dict().items()})
    assert not any("num_batches" in k for k in params)


def test_params_init_mode_creates_and_reuses():
    p = Params(rng=np.random.default_rng(0))
    w1 = p.get("c.weight", (3, 3, 4, 8), "conv")
    w2 = p.get("c.weight", (3, 3, 4, 8), "conv")
    assert w1 is w2
    with pytest.raises(KeyError):
        Params({}).get("missing.weight", (1, 1, 1, 1), "conv")
