"""Parity tests: batched transform estimation vs OpenCV ground truth."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from face_crop_plus_tpu.ops.transform import (  # noqa: E402
    estimate_affine,
    estimate_similarity,
    invert_affine,
)


def _random_points(rng, n_batches, n_points=5, scale=200.0):
    return rng.uniform(10, scale, size=(n_batches, n_points, 2)).astype(np.float32)


def test_similarity_matches_cv2(rng):
    src = _random_points(rng, 16)
    dst = _random_points(rng, 16)
    ours, valid = estimate_similarity(src, dst)
    ours = np.asarray(ours)
    assert np.asarray(valid).all()
    for i in range(len(src)):
        ref, _ = cv2.estimateAffinePartial2D(
            src[i], dst[i], ransacReprojThreshold=np.inf
        )
        np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=1e-3)


def test_similarity_known_transform(rng):
    # Construct dst by a known similarity and check exact recovery.
    theta, s, tx, ty = 0.3, 1.7, 12.0, -5.0
    r = s * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        dtype=np.float32,
    )
    src = _random_points(rng, 4)
    dst = src @ r.T + np.array([tx, ty], np.float32)
    m, valid = estimate_similarity(src, dst)
    m = np.asarray(m)
    assert np.asarray(valid).all()
    expected = np.concatenate([r, [[tx], [ty]]], axis=1)
    np.testing.assert_allclose(m, np.broadcast_to(expected, m.shape), atol=1e-3)


def test_affine_matches_cv2(rng):
    # Near-consistent correspondences (the real pipeline case: landmarks that
    # approximately follow a true affine transform + noise).
    a_true = np.array([[1.2, 0.3, 20.0], [-0.2, 0.9, -10.0]], np.float32)
    src = _random_points(rng, 16)
    dst = src @ a_true[:, :2].T + a_true[:, 2]
    dst = (dst + rng.normal(0, 1.0, dst.shape)).astype(np.float32)
    ours, valid = estimate_affine(src, dst)
    ours = np.asarray(ours)
    assert np.asarray(valid).all()
    for i in range(len(src)):
        ref, _ = cv2.estimateAffine2D(src[i], dst[i], ransacReprojThreshold=np.inf)
        np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=2e-2)


def test_affine_random_pairs_equal_residual(rng):
    # For unrelated point pairs the LSQ objective is nearly flat, so argmin
    # parity in float32 is not meaningful — but the achieved residual must
    # match cv2's float64 optimum to high relative accuracy.
    src = _random_points(rng, 8)
    dst = _random_points(rng, 8)
    ours, valid = estimate_affine(src, dst)
    ours = np.asarray(ours, np.float64)
    assert np.asarray(valid).all()

    def resid(m, s, q):
        return (((s @ m[:, :2].T + m[:, 2]) - q) ** 2).sum()

    for i in range(len(src)):
        ref, _ = cv2.estimateAffine2D(src[i], dst[i], ransacReprojThreshold=np.inf)
        r_ref = resid(ref, src[i], dst[i])
        r_ours = resid(ours[i], src[i], dst[i])
        assert r_ours <= r_ref * 1.001


def test_degenerate_points_flagged():
    src = np.ones((2, 5, 2), np.float32)  # all points coincide
    dst = np.ones((2, 5, 2), np.float32)
    _, valid_sim = estimate_similarity(src, dst)
    _, valid_aff = estimate_affine(src, dst)
    assert not np.asarray(valid_sim).any()
    assert not np.asarray(valid_aff).any()


def test_invert_affine_roundtrip(rng):
    # Well-conditioned random affine matrices (rotation+scale+shear+shift).
    ms = []
    for _ in range(8):
        th = rng.uniform(-1, 1)
        s = rng.uniform(0.5, 2.0)
        shear = rng.uniform(-0.3, 0.3)
        r = s * np.array(
            [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        ) @ np.array([[1.0, shear], [0.0, 1.0]])
        ms.append(np.hstack([r, rng.uniform(-50, 50, (2, 1))]))
    m = np.stack(ms).astype(np.float32)
    inv = np.asarray(invert_affine(m))
    for i in range(len(m)):
        a = np.vstack([m[i], [0, 0, 1]])
        b = np.vstack([inv[i], [0, 0, 1]])
        np.testing.assert_allclose(a @ b, np.eye(3), atol=1e-4)


def test_broadcast_target():
    # A single (L, 2) target must broadcast over the batch of sources.
    src = np.random.default_rng(1).uniform(0, 100, (7, 5, 2)).astype(np.float32)
    dst = np.random.default_rng(2).uniform(0, 100, (5, 2)).astype(np.float32)
    m, valid = estimate_similarity(src, dst)
    assert m.shape == (7, 2, 3)
    assert valid.shape == (7,)


def test_invert_affine_preserves_sign_of_tiny_negative_det():
    # A near-singular transform with a small NEGATIVE determinant must not
    # have its inverse sign-flipped by the epsilon guard (mirrored output).
    m = np.array([[[1e-7, 0.0, 3.0], [0.0, -1e-7, 4.0]]], np.float32)
    inv = np.asarray(invert_affine(m))
    # det = -1e-14 -> guarded to -1e-12 (sign kept): ia = d/det = 1e5 > 0,
    # id = a/det = -1e5 < 0 — with a +1e-12 guard both signs would flip.
    assert inv[0, 0, 0] > 0 and inv[0, 1, 1] < 0


def test_singular_fit_flagged_invalid():
    # Source points well-spread, but a destination forcing a = b = 0 in the
    # similarity fit (dst constant): the transform is not invertible and
    # must be flagged invalid rather than warped into garbage.
    src = np.array([[[0, 0], [100, 0], [100, 100], [0, 100], [50, 50]]], np.float32)
    dst = np.full((1, 5, 2), 7.0, np.float32)
    _, valid = estimate_similarity(src, dst)
    assert not np.asarray(valid)[0]
    # Affine: destination collapses onto a line -> det(A) = 0.
    dst_line = np.stack([src[0, :, 0], np.zeros(5, np.float32)], axis=-1)[None]
    _, valid_a = estimate_affine(src, dst_line)
    assert not np.asarray(valid_a)[0]


def test_numpy_twins_match_jax(rng):
    """estimate_*_np (pure-host path) match the jitted versions: same f32
    math, so agreement should be to reduction-order rounding only."""
    from face_crop_plus_tpu.ops.transform import (
        estimate_affine_np,
        estimate_similarity_np,
    )

    src = _random_points(rng, 64)
    dst = _random_points(rng, 64)
    for jfit, nfit in (
        (estimate_similarity, estimate_similarity_np),
        (estimate_affine, estimate_affine_np),
    ):
        mj, vj = jfit(src, dst)
        mn, vn = nfit(src, dst)
        np.testing.assert_allclose(np.asarray(mj), mn, rtol=2e-5, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(vj), vn)
    # degenerate: coincident points flagged identically
    bad = np.ones((3, 5, 2), np.float32)
    _, v = estimate_similarity_np(bad, _random_points(rng, 3))
    assert not v.any()
