"""Tests for the RetinaFace detector: shapes, decode, predict contract.

Without network access the pretrained checkpoint is unavailable, so these
run with random-initialized weights and validate structure: forward output
shapes vs the anchor count, decode math, the padded→compact predict
contract, and strategy behavior.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from face_crop_plus_tpu.models.detection import (
    RetinaFace,
    decode_detections,
    retinaface_forward,
)
from face_crop_plus_tpu.ops.anchors import anchor_grid, num_anchors
from face_crop_plus_tpu.ops.nn import Params


@pytest.fixture(scope="module")
def det():
    with pytest.warns(UserWarning, match="random"):
        return RetinaFace(strategy="all", vis=0.5, max_faces=8, pre_topk=64, device=None)


def test_forward_shapes(det):
    p = Params(det.params)
    x = jnp.zeros((2, 64, 96, 3), jnp.float32)
    scores, loc, ldm = retinaface_forward(p, x)
    a = num_anchors(64, 96)
    assert scores.shape == (2, a, 2)
    assert loc.shape == (2, a, 4)
    assert ldm.shape == (2, a, 10)
    # Softmaxed scores sum to 1.
    np.testing.assert_allclose(np.asarray(scores).sum(-1), 1.0, atol=1e-5)


def test_decode_identity_offsets():
    # Zero regressions decode to the anchors themselves (in pixels).
    h, w = 64, 64
    priors = jnp.asarray(anchor_grid(h, w))
    a = priors.shape[0]
    loc = jnp.zeros((1, a, 4))
    ldm = jnp.zeros((1, a, 10))
    boxes, landms = decode_detections(loc, ldm, priors, (h, w))
    boxes = np.asarray(boxes)[0]
    p = np.asarray(priors)
    np.testing.assert_allclose(
        boxes[:, 0], (p[:, 0] - p[:, 2] / 2) * w, atol=1e-3
    )
    np.testing.assert_allclose(
        boxes[:, 2] - boxes[:, 0], p[:, 2] * w, atol=1e-3
    )
    # Landmarks decode to anchor centers.
    lm = np.asarray(landms)[0].reshape(a, 5, 2)
    np.testing.assert_allclose(lm[:, 0, 0], p[:, 0] * w, atol=1e-3)


def test_predict_contract(det, rng):
    imgs = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
    landmarks, indices = det.predict(imgs)
    assert landmarks.dtype == np.float32
    assert landmarks.ndim == 3 and landmarks.shape[1:] == (5, 2)
    assert len(indices) == len(landmarks)
    assert all(0 <= i < 3 for i in indices)
    # Indices are ascending (image-major order), reference contract.
    assert indices == sorted(indices)


def test_predict_strategy_best_one_face_per_image(rng):
    with pytest.warns(UserWarning, match="random"):
        det = RetinaFace(strategy="best", vis=-1.0, pre_topk=32, device=None)
    # vis=-1 guarantees at least one candidate per image survives.
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    landmarks, indices = det.predict(imgs)
    assert indices == [0, 1]
    assert landmarks.shape == (2, 5, 2)


def test_predict_no_faces(rng):
    with pytest.warns(UserWarning, match="random"):
        det = RetinaFace(strategy="all", vis=2.0, pre_topk=32, device=None)  # impossible
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    landmarks, indices = det.predict(imgs)
    assert len(landmarks) == 0 and indices == []


def test_threshold_override_takes_effect_after_first_call(rng):
    """vis_threshold mutation after a compiled call must retrace, not hit
    the stale executable (the jit cache keys on config values)."""
    from face_crop_plus_tpu.models.detection import RetinaFace

    det = RetinaFace(strategy="all", vis=2.0)  # nothing passes
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    lm, idx = det.predict(imgs)
    assert len(idx) == 0
    det.vis_threshold = -1.0  # everything passes now
    lm2, idx2 = det.predict(imgs)
    assert len(idx2) > 0
