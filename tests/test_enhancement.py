"""Tests for the RRDBNet enhancer: dense-block parity vs torch, gating."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from face_crop_plus_tpu.models.enhancement import (  # noqa: E402
    RRDBNet,
    _dense_block,
    mean_face_factor,
    rrdbnet_forward,
)
from face_crop_plus_tpu.models.weights import convert_state_dict  # noqa: E402
from face_crop_plus_tpu.ops.nn import Params  # noqa: E402


class _TorchDenseBlock(tnn.Module):
    """5-conv residual dense block equivalent (parity only)."""

    def __init__(self, nf=64, gc=32):
        super().__init__()
        self.conv1 = tnn.Conv2d(nf, gc, 3, 1, 1)
        self.conv2 = tnn.Conv2d(nf + gc, gc, 3, 1, 1)
        self.conv3 = tnn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
        self.conv4 = tnn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
        self.conv5 = tnn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)
        self.act = tnn.LeakyReLU(0.2)

    def forward(self, x):
        x1 = self.act(self.conv1(x))
        x2 = self.act(self.conv2(torch.cat([x, x1], 1)))
        x3 = self.act(self.conv3(torch.cat([x, x1, x2], 1)))
        x4 = self.act(self.conv4(torch.cat([x, x1, x2, x3], 1)))
        x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
        return x5 * 0.2 + x


def test_dense_block_matches_torch(rng):
    tm = _TorchDenseBlock().eval()
    sd = {f"RDB.{k}": v for k, v in tm.state_dict().items()}
    p = Params({k: jnp.asarray(v) for k, v in convert_state_dict(sd).items()})
    x = rng.normal(size=(1, 8, 8, 64)).astype(np.float32)
    ours = np.asarray(_dense_block(p, "RDB", jnp.asarray(x)))
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)


def test_forward_upscales_4x():
    p = Params(rng=np.random.default_rng(0))
    x = jnp.zeros((1, 12, 16, 3), jnp.float32)
    y = rrdbnet_forward(p, x, num_blocks=2)
    assert y.shape == (1, 48, 64, 3)


def test_mean_face_factor():
    lm = np.zeros((3, 5, 2), np.float32)
    # face 0 in image 0: 10x20 extent; faces 1,2 in image 1: 10x10 and 30x10.
    lm[0, 0] = [0, 0]
    lm[0, 4] = [10, 20]
    lm[1, 0] = [0, 0]
    lm[1, 4] = [10, 10]
    lm[2, 0] = [0, 0]
    lm[2, 4] = [30, 10]
    f = mean_face_factor(lm, [0, 1, 1], n_images=3, image_hw=(100, 100))
    assert np.isclose(f[0], 200 / 10000)
    assert np.isclose(f[1], (100 + 300) / 2 / 10000)
    assert np.isnan(f[2])  # image 2 has no faces


@pytest.fixture(scope="module")
def enh():
    with pytest.warns(UserWarning, match="random"):
        return RRDBNet(min_face_factor=0.05, num_blocks=2, device=None)


def test_gating_selective(enh, rng):
    imgs = rng.integers(0, 255, (3, 16, 16, 3), dtype=np.uint8)
    # image 0: big face (factor 0.5) -> not enhanced; image 1: tiny face
    # (factor ~0.0016) -> enhanced; image 2: no face -> untouched.
    lm = np.zeros((2, 5, 2), np.float32)
    lm[0, 4] = [11.3, 11.3]  # ~128/256 = 0.5
    lm[1, 4] = [0.64, 0.64]  # ~0.0016
    out = enh.predict(imgs, lm, [0, 1])
    np.testing.assert_array_equal(out[0], imgs[0])
    np.testing.assert_array_equal(out[2], imgs[2])
    assert not np.array_equal(out[1], imgs[1])
    assert out.dtype == np.uint8


def test_gating_none_enhances_all(enh, rng):
    imgs = rng.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8)
    out = enh.predict(imgs, None, None)
    assert not np.array_equal(out[0], imgs[0])
    assert not np.array_equal(out[1], imgs[1])


def test_ragged_list_input(enh, rng):
    imgs = [
        rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
        rng.integers(0, 255, (20, 16, 3), dtype=np.uint8),
        rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
    ]
    out = enh.predict(imgs, None, None)
    assert isinstance(out, list)
    assert [o.shape for o in out] == [i.shape for i in imgs]
    assert all(not np.array_equal(o, i) for o, i in zip(out, imgs))


def test_predict_empty_batch_passthrough():
    import numpy as np

    from face_crop_plus_tpu.models.enhancement import RRDBNet

    m = RRDBNet(num_blocks=1)
    out = m.predict(np.zeros((0, 8, 8, 3), np.uint8), None, None)
    assert len(out) == 0
    assert m.predict([], None, None) == []
