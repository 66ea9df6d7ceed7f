"""Pallas NMS kernel: interpreter-mode equivalence with the XLA version."""

import numpy as np
import pytest
import jax.numpy as jnp

from face_crop_plus_tpu.ops.nms import greedy_nms_mask, iou_matrix_plus1
from face_crop_plus_tpu.ops.pallas.nms_kernel import greedy_nms_mask_pallas


def _random_sorted_dets(rng, n=3, k=128):
    scores = np.sort(rng.uniform(0, 1, (n, k)).astype(np.float32))[:, ::-1]
    x1 = rng.uniform(0, 80, (n, k))
    y1 = rng.uniform(0, 80, (n, k))
    w = rng.uniform(5, 40, (n, k))
    h = rng.uniform(5, 40, (n, k))
    boxes = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    valid = scores > 0.3
    return boxes, valid


def test_pallas_matches_xla_nms(rng):
    boxes, valid = _random_sorted_dets(rng)
    ref = np.asarray(
        greedy_nms_mask(
            iou_matrix_plus1(jnp.asarray(boxes)), jnp.asarray(valid), 0.4
        )
    )
    ours = np.asarray(
        greedy_nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(valid), 0.4, interpret=True
        )
    )
    np.testing.assert_array_equal(ours, ref)


def test_pallas_all_invalid(rng):
    boxes, _ = _random_sorted_dets(rng, n=2)
    valid = np.zeros(boxes.shape[:2], bool)
    out = np.asarray(
        greedy_nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(valid), 0.4, interpret=True
        )
    )
    assert not out.any()


def test_pallas_identical_boxes(rng):
    # All candidates identical: only the first valid survives.
    k = 128
    box = np.tile(np.array([10, 10, 50, 50], np.float32), (1, k, 1))
    valid = np.ones((1, k), bool)
    out = np.asarray(
        greedy_nms_mask_pallas(jnp.asarray(box), jnp.asarray(valid), 0.4,
                               interpret=True)
    )
    assert out[0, 0] and not out[0, 1:].any()
