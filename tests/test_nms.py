"""Tests for batched fixed-shape NMS + strategy selection.

Ground truth is an independent sequential greedy NMS written in numpy with
the same conventions the reference uses (+1 areas, suppress at IoU > thr,
score-descending order).
"""

import numpy as np
import jax.numpy as jnp

from face_crop_plus_tpu.ops.nms import (
    greedy_nms_mask,
    iou_matrix_plus1,
    select_faces,
)


def _naive_greedy(scores, boxes, vis, thr):
    """Sequential reference NMS; returns kept indices in score order."""
    idx = [i for i in np.argsort(-scores) if scores[i] > vis]
    kept = []
    while idx:
        j = idx.pop(0)
        kept.append(j)
        rest = []
        for k in idx:
            xx1 = max(boxes[j, 0], boxes[k, 0])
            yy1 = max(boxes[j, 1], boxes[k, 1])
            xx2 = min(boxes[j, 2], boxes[k, 2])
            yy2 = min(boxes[j, 3], boxes[k, 3])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            area_j = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
            area_k = (boxes[k, 2] - boxes[k, 0] + 1) * (boxes[k, 3] - boxes[k, 1] + 1)
            if inter / (area_j + area_k - inter) <= thr:
                rest.append(k)
        idx = rest
    return kept


def _random_dets(rng, n_img=3, n_anchor=40):
    scores = rng.uniform(0, 1, (n_img, n_anchor)).astype(np.float32)
    x1 = rng.uniform(0, 80, (n_img, n_anchor))
    y1 = rng.uniform(0, 80, (n_img, n_anchor))
    w = rng.uniform(5, 40, (n_img, n_anchor))
    h = rng.uniform(5, 40, (n_img, n_anchor))
    boxes = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    landms = rng.uniform(0, 100, (n_img, n_anchor, 10)).astype(np.float32)
    return scores, boxes, landms


def test_iou_matrix_plus1():
    boxes = np.array([[[0, 0, 9, 9], [0, 0, 9, 9], [20, 20, 29, 29]]], np.float32)
    iou = np.asarray(iou_matrix_plus1(jnp.asarray(boxes)))[0]
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 1.0, atol=1e-6)
    assert iou[0, 2] == 0.0


def test_greedy_mask_matches_naive(rng):
    scores, boxes, landms = _random_dets(rng)
    vis, thr = 0.4, 0.4
    for i in range(scores.shape[0]):
        order = np.argsort(-scores[i])
        b_sorted = boxes[i][order]
        s_sorted = scores[i][order]
        valid = jnp.asarray(s_sorted > vis)[None]
        iou = iou_matrix_plus1(jnp.asarray(b_sorted)[None])
        keep = np.asarray(greedy_nms_mask(iou, valid, thr))[0]
        ours_kept = order[np.nonzero(keep)[0]].tolist()
        ref_kept = _naive_greedy(scores[i], boxes[i], vis, thr)
        assert sorted(ours_kept) == sorted(ref_kept)


def test_select_faces_all_ordering(rng):
    scores, boxes, landms = _random_dets(rng)
    lm, valid, _caps = select_faces(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(landms),
        vis_threshold=0.4, pre_topk=40, max_faces=8, strategy="all",
    )
    lm, valid = np.asarray(lm), np.asarray(valid)
    for i in range(scores.shape[0]):
        ref_kept = _naive_greedy(scores[i], boxes[i], 0.4, 0.4)[:8]
        assert valid[i].sum() == len(ref_kept)
        # Valid entries packed to the front, in score order.
        np.testing.assert_allclose(
            lm[i, : len(ref_kept)], landms[i][ref_kept], atol=1e-5
        )
        assert not valid[i, len(ref_kept):].any()


def test_select_faces_best_and_largest(rng):
    scores, boxes, landms = _random_dets(rng)
    lm_b, v_b, _c1 = select_faces(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(landms),
        vis_threshold=0.4, pre_topk=40, strategy="best",
    )
    lm_l, v_l, _c2 = select_faces(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(landms),
        vis_threshold=0.4, pre_topk=40, strategy="largest",
    )
    for i in range(scores.shape[0]):
        kept = _naive_greedy(scores[i], boxes[i], 0.4, 0.4)
        assert np.asarray(v_b)[i, 0] == (len(kept) > 0)
        if kept:
            # best = highest score among kept (first in NMS order)
            np.testing.assert_allclose(np.asarray(lm_b)[i, 0], landms[i][kept[0]], atol=1e-5)
            # largest = max +1-convention area among kept
            areas = [
                (boxes[i, k, 2] - boxes[i, k, 0] + 1) * (boxes[i, k, 3] - boxes[i, k, 1] + 1)
                for k in kept
            ]
            j = kept[int(np.argmax(areas))]
            np.testing.assert_allclose(np.asarray(lm_l)[i, 0], landms[i][j], atol=1e-5)


def test_select_faces_none_above_threshold(rng):
    scores = np.full((2, 10), 0.1, np.float32)
    boxes = np.tile(np.array([0, 0, 10, 10], np.float32), (2, 10, 1))
    landms = np.zeros((2, 10, 10), np.float32)
    _, valid, _caps = select_faces(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(landms),
        vis_threshold=0.6, pre_topk=10, max_faces=4, strategy="all",
    )
    assert not np.asarray(valid).any()
