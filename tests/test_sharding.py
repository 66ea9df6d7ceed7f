"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that data-parallel execution is numerically identical to
single-device execution and that batch padding at the mesh boundary is
correct. (conftest.py forces JAX_PLATFORMS=cpu with 8 virtual devices.)
"""

import os
import sys

import numpy as np
import pytest
import jax

from face_crop_plus_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_pad_to_multiple():
    x = np.arange(10).reshape(5, 2)
    padded, valid = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and valid == 5
    np.testing.assert_array_equal(padded[5:], np.tile(x[-1:], (3, 1)))
    same, valid2 = pad_to_multiple(x[:4], 4)
    assert same.shape == (4, 2) and valid2 == 4


def test_shard_batch_placement(mesh):
    x = np.zeros((16, 4), np.float32)
    sx = shard_batch(x, mesh)
    assert len(sx.sharding.device_set) == 8


def test_detector_sharded_contract(mesh, rng):
    # With random weights the score landscape is near-uniform, so argmax/
    # top-k selections are not stable across different reduction orders —
    # the sharded run must still satisfy the full output contract.
    from face_crop_plus_tpu.models.detection import RetinaFace

    imgs = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    with pytest.warns(UserWarning):
        det_mesh = RetinaFace(strategy="best", vis=-1.0, pre_topk=32, mesh=mesh)
    lm_m, idx_m = det_mesh.predict(imgs)
    assert idx_m == list(range(8))  # one face per image at vis=-1
    assert lm_m.shape == (8, 5, 2)
    assert np.isfinite(lm_m).all()


def test_warp_sharded_matches_single(mesh, rng):
    # The warp is deterministic: sharding over faces must be bit-identical.
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from face_crop_plus_tpu.ops.warp import warp_affine_batch

    imgs = rng.integers(0, 255, (8, 40, 40, 3), dtype=np.uint8)
    mats = np.tile(np.eye(2, 3, dtype=np.float32), (8, 1, 1))
    mats[:, 0, 2] = rng.uniform(-5, 5, 8)
    idx = np.arange(8, dtype=np.int32)

    single = np.asarray(warp_affine_batch(imgs, mats, idx, (16, 16), "reflect"))

    data_s = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    out = warp_affine_batch(
        jax.device_put(imgs, data_s),
        jax.device_put(mats, data_s),
        jax.device_put(idx, data_s),
        (16, 16),
        "reflect",
    )
    assert len(out.sharding.device_set) == 8
    np.testing.assert_array_equal(single, np.asarray(out))


def test_detector_sharded_nondivisible_batch(mesh, rng):
    from face_crop_plus_tpu.models.detection import RetinaFace

    imgs = rng.integers(0, 255, (5, 64, 64, 3), dtype=np.uint8)  # 5 % 8 != 0
    with pytest.warns(UserWarning):
        det = RetinaFace(strategy="best", vis=-1.0, pre_topk=32, mesh=mesh)
    lm, idx = det.predict(imgs)
    assert idx == [0, 1, 2, 3, 4]
    assert lm.shape == (5, 5, 2)


def test_parser_sharded_mostly_matches_single(mesh, rng):
    # Labels are argmax over (random-weight) logits; allow rare tie flips
    # from cross-device reduction-order differences.
    from face_crop_plus_tpu.models.parsing import BiSeNet

    imgs = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    with pytest.warns(UserWarning):
        par_single = BiSeNet(attr_groups={"g": [1]}, max_batch_size=8, device=None)
    with pytest.warns(UserWarning):
        par_mesh = BiSeNet(attr_groups={"g": [1]}, max_batch_size=8, mesh=mesh)
    labels_s, counts_s = par_single.parse_batch(imgs)
    labels_m, counts_m = par_mesh.parse_batch(imgs)
    assert (labels_s == labels_m).mean() > 0.99
    assert np.abs(counts_s - counts_m).sum() < 0.01 * counts_s.sum()


def test_graft_dryrun_multichip():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
