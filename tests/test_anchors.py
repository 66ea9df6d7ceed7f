"""Tests for the vectorized anchor grid (vs an independent naive loop)."""

import math

import numpy as np

from face_crop_plus_tpu.ops.anchors import MIN_SIZES, STRIDES, anchor_grid, num_anchors


def _naive_anchors(h, w):
    """Straightforward nested-loop reimplementation of the anchor spec."""
    out = []
    for stride, sizes in zip(STRIDES, MIN_SIZES):
        fh, fw = math.ceil(h / stride), math.ceil(w / stride)
        for i in range(fh):
            for j in range(fw):
                for ms in sizes:
                    cx = (j + 0.5) * stride / w
                    cy = (i + 0.5) * stride / h
                    out.append((cx, cy, ms / w, ms / h))
    return np.array(out, np.float32)


def test_anchor_count_1024():
    # The reference documents 43,008 priors at 1024x1024 (retinaface.py:35).
    assert num_anchors(1024, 1024) == 43008
    assert anchor_grid(1024, 1024).shape == (43008, 4)


def test_anchor_grid_matches_naive():
    for h, w in [(64, 64), (96, 128), (100, 60)]:
        fast = anchor_grid(h, w)
        slow = _naive_anchors(h, w)
        np.testing.assert_allclose(fast, slow, atol=1e-7)


def test_anchor_grid_cached():
    assert anchor_grid(256, 256) is anchor_grid(256, 256)
