"""Tests for the BiSeNet parser: block parity vs torch, grouping semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from face_crop_plus_tpu.models.parsing import (  # noqa: E402
    NUM_CLASSES,
    BiSeNet,
    _arm,
    _basic_block,
    bisenet_forward,
)
from face_crop_plus_tpu.models.weights import convert_state_dict  # noqa: E402
from face_crop_plus_tpu.ops.nn import Params  # noqa: E402


def _params_from(torch_module, prefix):
    sd = {f"{prefix}.{k}": v for k, v in torch_module.state_dict().items()}
    return Params({k: jnp.asarray(v) for k, v in convert_state_dict(sd).items()})


class _TorchBasicBlock(tnn.Module):
    """Residual basic block equivalent to the parser's (for parity only)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if cin != cout or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        r = tF.relu(self.bn1(self.conv1(x)))
        r = self.bn2(self.conv2(r))
        s = x if self.downsample is None else self.downsample(x)
        return tF.relu(s + r)


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(torch.randn(mod.num_features) * 0.2)
                mod.running_var.copy_(torch.rand(mod.num_features) + 0.5)
                mod.weight.copy_(torch.randn(mod.num_features) * 0.2 + 1)
                mod.bias.copy_(torch.randn(mod.num_features) * 0.2)


@pytest.mark.parametrize("cin,cout,stride", [(8, 8, 1), (8, 16, 2)])
def test_basic_block_matches_torch(rng, cin, cout, stride):
    tm = _TorchBasicBlock(cin, cout, stride).eval()
    _randomize_bn(tm)
    p = _params_from(tm, "blk")
    x = rng.normal(size=(2, 12, 12, cin)).astype(np.float32)
    ours = np.asarray(_basic_block(p, "blk", jnp.asarray(x), cout, stride))
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)


class _TorchARM(tnn.Module):
    """Attention refinement module equivalent (for parity only)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Sequential()
        self.conv.conv = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.conv.bn = tnn.BatchNorm2d(cout)
        self.conv_atten = tnn.Conv2d(cout, cout, 1, bias=False)
        self.bn_atten = tnn.BatchNorm2d(cout)

    def forward(self, x):
        feat = tF.relu(self.conv.bn(self.conv.conv(x)))
        a = tF.avg_pool2d(feat, feat.shape[2:])
        a = torch.sigmoid(self.bn_atten(self.conv_atten(a)))
        return feat * a


def test_arm_matches_torch(rng):
    tm = _TorchARM(8, 4).eval()
    _randomize_bn(tm)
    p = _params_from(tm, "arm")
    x = rng.normal(size=(2, 10, 10, 8)).astype(np.float32)
    ours = np.asarray(_arm(p, "arm", jnp.asarray(x), 4))
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)


def test_forward_shapes():
    p = Params(rng=np.random.default_rng(0))
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = bisenet_forward(p, x)
    assert out.shape == (2, 64, 64, NUM_CLASSES)


@pytest.fixture(scope="module")
def par():
    with pytest.warns(UserWarning, match="random"):
        return BiSeNet(
            attr_groups={"g": [6]},
            mask_groups={"m": [4, 5]},
            max_batch_size=4,
            device=None,
        )


def test_group_by_attributes_semantics(par):
    par.attr_groups = {
        "has6": [6],
        "no6_no18": [-6, -18],
        "both": [4, 5],
    }
    counts = np.zeros((3, NUM_CLASSES), np.int32)
    counts[0, 6] = 10  # face 0: attribute 6 present
    counts[1, 4] = 10
    counts[1, 5] = 10  # face 1: 4 and 5 present
    counts[2, 6] = 3  # face 2: 6 below threshold (5)
    g = par.group_by_attributes(counts)
    assert g["has6"] == [0]
    assert g["no6_no18"] == [1, 2]
    assert g["both"] == [1]


def test_group_by_attributes_or_join(par):
    par.attr_groups = {"any45": [4, 5]}
    par.attr_join_by_and = False
    counts = np.zeros((2, NUM_CLASSES), np.int32)
    counts[0, 4] = 10
    g = par.group_by_attributes(counts)
    assert g["any45"] == [0]
    par.attr_join_by_and = True


def test_group_by_masks_semantics(par):
    par.mask_groups = {"eyes": [4, 5]}
    labels = np.zeros((2, 16, 16), np.uint8)
    labels[0, :4, :4] = 4  # 16 pixels > threshold 10
    labels[1, 0, 0] = 5  # 1 pixel <= threshold
    counts = np.stack(
        [np.bincount(l.reshape(-1), minlength=NUM_CLASSES) for l in labels]
    ).astype(np.int32)
    g = par.group_by_masks(labels, counts)
    inds, masks = g["eyes"]
    assert inds == [0]
    assert masks.shape == (1, 16, 16)
    assert masks[0, 0, 0] == 255 and masks[0, 8, 8] == 0
    assert (masks[0] == 255).sum() == 16


def test_predict_contract(par, rng):
    par.attr_groups = {"g": [1]}
    par.mask_groups = {"m": [1]}
    imgs = rng.integers(0, 255, (5, 32, 32, 3), dtype=np.uint8)  # odd batch vs bs=4
    attr, mask = par.predict(imgs)
    if attr is not None:
        for v in attr.values():
            assert all(0 <= i < 5 for i in v)
    if mask is not None:
        for inds, masks in mask.values():
            assert len(inds) == len(masks)
            assert masks.dtype == np.uint8
            assert set(np.unique(masks)) <= {0, 255}


def test_mean_std_override_takes_effect_after_first_call(rng):
    """mean/std are documented as overridable after construction; the jit
    cache must key on their values, not object identity."""
    from face_crop_plus_tpu.models.parsing import BiSeNet

    m = BiSeNet(attr_groups={"x": [1]}, max_batch_size=2)
    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    labels1, counts1 = m.parse_batch(imgs)
    m.mean = [0.0, 0.0, 0.0]
    m.std = [0.1, 0.1, 0.1]
    labels2, counts2 = m.parse_batch(imgs)
    # Radically different normalization must change the (random-weight)
    # logits argmax somewhere.
    assert not np.array_equal(counts1, counts2) or not np.array_equal(
        labels1, labels2
    )


def test_packed_masks_match_raster_path(par, rng):
    """predict's bit-packed mask path == the label-raster path, exactly.

    The packed path fetches 1 bit/pixel per group instead of the 1
    byte/pixel label raster (r3 transfer optimization); membership and the
    reconstructed 0/255 masks must be identical — including an odd width
    that exercises the pack padding.
    """
    par.attr_groups = {"g": [1]}
    par.mask_groups = {"m": [1], "pair": [2, 3]}
    for w in (32, 27):  # 27: width not a multiple of 8
        imgs = rng.integers(0, 255, (5, 32, w, 3), dtype=np.uint8)
        attr, mask = par.predict(imgs)

        labels, counts = par.parse_batch(imgs)
        want = par.group_by_masks(labels, counts)
        want = {k: v for k, v in want.items() if len(v[0]) > 0}

        assert (mask or {}).keys() == want.keys()
        for k in want:
            inds, masks = (mask or {})[k]
            winds, wmasks = want[k]
            assert inds == winds
            np.testing.assert_array_equal(masks, wmasks)


def test_parse_counts_matches_parse_batch(par, rng):
    imgs = rng.integers(0, 255, (3, 24, 24, 3), dtype=np.uint8)
    _labels, counts = par.parse_batch(imgs)
    np.testing.assert_array_equal(par.parse_counts(imgs), counts)
