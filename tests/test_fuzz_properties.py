"""Property/fuzz tests: invariants over randomized inputs.

These complement the golden/parity suites with properties that must hold
for any input: NMS keep-sets are antichains under IoU, warps of constant
images are constant, transforms are equivariant, strategy outputs are
subsets of "all".
"""

import numpy as np
import pytest
import jax.numpy as jnp

from face_crop_plus_tpu.ops.nms import greedy_nms_mask, iou_matrix_plus1, select_faces
from face_crop_plus_tpu.ops.transform import estimate_similarity
from face_crop_plus_tpu.ops.warp import warp_affine_batch


def _dets(rng, n=4, k=32):
    scores = rng.uniform(0, 1, (n, k)).astype(np.float32)
    x1 = rng.uniform(0, 100, (n, k))
    y1 = rng.uniform(0, 100, (n, k))
    w = rng.uniform(4, 50, (n, k))
    h = rng.uniform(4, 50, (n, k))
    boxes = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    landms = rng.uniform(0, 120, (n, k, 10)).astype(np.float32)
    return scores, boxes, landms


@pytest.mark.parametrize("seed", range(5))
def test_nms_keepset_is_antichain(seed):
    rng = np.random.default_rng(seed)
    scores, boxes, _ = _dets(rng)
    order = np.argsort(-scores, axis=1)
    b = np.take_along_axis(boxes, order[..., None], axis=1)
    keep = np.asarray(
        greedy_nms_mask(
            iou_matrix_plus1(jnp.asarray(b)), jnp.ones(b.shape[:2], bool), 0.4
        )
    )
    iou = np.asarray(iou_matrix_plus1(jnp.asarray(b)))
    for i in range(b.shape[0]):
        kept = np.nonzero(keep[i])[0]
        for a in range(len(kept)):
            for c in range(a + 1, len(kept)):
                assert iou[i, kept[a], kept[c]] <= 0.4 + 1e-6


@pytest.mark.parametrize("seed", range(3))
def test_strategy_outputs_subset_of_all(seed):
    rng = np.random.default_rng(seed)
    scores, boxes, landms = _dets(rng)
    args = (jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(landms))
    # max_faces >= pre_topk so "all" is untruncated (otherwise "largest"
    # may legitimately pick a face beyond the static cap).
    lm_all, v_all, _c = select_faces(*args, vis_threshold=0.3, pre_topk=32,
                                 max_faces=32, strategy="all")
    for strat in ("best", "largest"):
        lm_s, v_s, _c2 = select_faces(*args, vis_threshold=0.3, pre_topk=32,
                                 strategy=strat)
        for i in range(scores.shape[0]):
            if not np.asarray(v_s)[i, 0]:
                continue
            sel = np.asarray(lm_s)[i, 0]
            all_lms = np.asarray(lm_all)[i][np.asarray(v_all)[i]]
            dists = np.abs(all_lms - sel).max(axis=1)
            assert dists.min() < 1e-5, f"{strat} output not among 'all' outputs"


@pytest.mark.parametrize("mode", ["constant", "replicate", "reflect_101", "wrap"])
def test_warp_constant_image_is_constant(rng, mode):
    # Warping a constant image yields that constant wherever support is
    # inside (and everywhere for non-constant border modes).
    img = np.full((1, 40, 40, 3), 77, np.uint8)
    mats = np.array([[[0.7, 0.2, 5.0], [-0.2, 0.7, 3.0]]], np.float32)
    out = np.asarray(
        warp_affine_batch(img, mats, np.zeros(1, np.int32), (24, 24), mode)
    )
    if mode == "constant":
        # Values blend between the constant and the zero border: within
        # [0, 77], and fully-interior pixels exactly 77.
        assert out.min() >= -1e-3 and out.max() <= 77 + 1e-3
        assert np.isclose(out[0, 12, 12], 77.0, atol=1e-3).all()
    else:
        np.testing.assert_allclose(out, 77.0, atol=1e-3)


@pytest.mark.parametrize("seed", range(3))
def test_similarity_translation_equivariance(seed):
    rng = np.random.default_rng(seed)
    src = rng.uniform(10, 100, (1, 5, 2)).astype(np.float32)
    dst = rng.uniform(10, 100, (1, 5, 2)).astype(np.float32)
    shift = np.array([17.0, -8.0], np.float32)
    m1, _ = estimate_similarity(src, dst)
    m2, _ = estimate_similarity(src + shift, dst)
    # Linear parts equal; translation absorbs the shift.
    np.testing.assert_allclose(np.asarray(m1)[0, :, :2], np.asarray(m2)[0, :, :2], atol=1e-4)
    expected_t = np.asarray(m1)[0, :, 2] - np.asarray(m2)[0, :, :2] @ shift
    np.testing.assert_allclose(np.asarray(m2)[0, :, 2], expected_t, atol=1e-2)


def test_warp_identity_is_crop(rng):
    img = rng.integers(0, 255, (1, 30, 30, 3), dtype=np.uint8)
    eye = np.eye(2, 3, dtype=np.float32)[None]
    out = np.asarray(
        warp_affine_batch(img, eye, np.zeros(1, np.int32), (20, 20), "constant")
    )
    np.testing.assert_allclose(out[0], img[0, :20, :20].astype(np.float32), atol=1e-4)
