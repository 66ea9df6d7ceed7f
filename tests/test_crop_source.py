"""crop_source="interim": reference-parity sampling on the fused hot path.

The fused pipeline's default crops sample the original-resolution sources
(better than the reference, which warps the detector-resolution interim —
reference cropper.py:839-843).  ``crop_source="interim"`` reproduces the
reference's sampling so bit-compatibility validation can run the fused hot
path; the staged path has always cropped from the interim, so the two must
agree (the windowed device sampling is tested exactly below against a
manual un-pad + warp of the same interim pixels).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from face_crop_plus_tpu.models.detection import RetinaFace
from face_crop_plus_tpu.ops.warp import warp_affine_batch
from face_crop_plus_tpu.ops.transform import estimate_similarity
from face_crop_plus_tpu.pipeline import FusedPipeline, device_resize_pad
from face_crop_plus_tpu.utils.landmarks import make_target_landmarks


@pytest.fixture(scope="module")
def det():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return RetinaFace(strategy="best", vis=-1.0)


def _pipe(det, crop_source):
    target = make_target_landmarks((64, 64), 0.65)
    return FusedPipeline(
        det_model=det,
        target_landmarks=target,
        output_size=(64, 64),
        border_mode="constant",
        crop_source=crop_source,
    )


def test_windowed_interim_sampling_exact(rng, det):
    """_crop_selected(lm_scale, window) == manual un-pad + warp of the same
    interim pixels — the sampling math behind crop_source="interim"."""
    imgs = rng.integers(0, 255, (2, 120, 160, 3), dtype=np.uint8)
    fp = _pipe(det, "interim")

    interim, scale, pad = device_resize_pad(
        jnp.asarray(imgs).astype(jnp.float32), (128, 128)
    )
    interim_u8 = jnp.clip(jnp.rint(interim), 0, 255).astype(jnp.uint8)
    t, b, l, r = np.asarray(pad)

    # Controlled in-bounds source landmarks: one face per image.
    lm = np.array(
        [
            [[50, 40], [90, 40], [70, 60], [55, 80], [85, 80]],
            [[40, 50], [80, 52], [60, 72], [45, 90], [78, 92]],
        ],
        np.float32,
    )
    window = jnp.asarray(
        [t, l, 128 - t - b, 128 - l - r], jnp.int32
    )
    got, ok = fp._crop_selected(
        interim_u8, jnp.asarray(lm), jnp.asarray([0, 1], jnp.int32),
        float(scale), window,
    )
    assert bool(ok.all())

    # Manual reference computation: physically un-pad the interim, then
    # estimate+warp in un-padded interim coordinates (what the reference's
    # crop_align does after its step 1 "remove the padding").
    unpadded = np.asarray(interim_u8)[:, t : 128 - b, l : 128 - r]
    lm_i = lm * float(scale)
    mats, ok2 = estimate_similarity(jnp.asarray(lm_i), jnp.asarray(fp.target))
    want = warp_affine_batch(
        jnp.asarray(unpadded), mats, jnp.asarray([0, 1], jnp.int32),
        (64, 64), "constant",
    )
    want = np.asarray(jnp.clip(jnp.rint(want), 0, 255).astype(jnp.uint8))
    # Window-offset coordinates reassociate the bilinear weights, so a
    # handful of samples sitting exactly on a .5 rounding boundary may flip
    # by one level; everything else is bit-identical.
    diff = np.abs(np.asarray(got).astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3
    assert np.asarray(got).mean() > 1.0  # crops carry real pixels


def test_run_interim_vs_original_dispatch(rng, det):
    """The single-dispatch program honors crop_source; with random weights
    the outputs have identical shape/validity, and both modes execute the
    (h, w) != interim branch without error."""
    imgs = rng.integers(0, 255, (2, 120, 160, 3), dtype=np.uint8)
    out_o = _pipe(det, "original").process(imgs, (128, 128))
    out_i = _pipe(det, "interim").process(imgs, (128, 128))
    assert out_o[0].shape == out_i[0].shape
    np.testing.assert_allclose(out_o[1], out_i[1], atol=1e-4)  # same landmarks
    np.testing.assert_array_equal(out_o[2], out_i[2])


def test_strategy_all_interim_caps_diagnostic(rng):
    """strategy="all" + crop_source="interim" feeds caps (not interim pixels)
    to the growth policy.

    Regression: the two-program "all" path with interim sampling selects
    ``_run_detect_interim`` (caps at index 2, interim appended after); the
    dispatch used to pass the uint8 interim batch as the caps diagnostic,
    so typical pixel values (~255 > max_faces) triggered a spurious 4x cap
    growth/recompile on every run and masked genuine cap saturation.
    """
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # auto_grow off: vis=-1.0 makes every anchor a candidate, so any
        # growth here would be *genuine* saturation; the regression under
        # test is the diagnostic's identity, not the growth policy.
        det = RetinaFace(
            strategy="all", vis=-1.0, max_faces=8, pre_topk=64,
            auto_grow=False,
        )
    fp = _pipe(det, "interim")
    pre = (det.max_faces, det.pre_topk)

    imgs = rng.integers(0, 255, (2, 120, 160, 3), dtype=np.uint8)
    seen = {}
    orig = det.grown_args

    def spy(caps, args, n_anchors):
        seen["caps"] = np.asarray(caps)
        return orig(caps, args, n_anchors)

    det.grown_args = spy
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # genuine cap-binding warning
        crops, lm, idx = fp.process(imgs, (128, 128))
    # The diagnostic must be the (N, 2) caps array (candidate/keep counts),
    # not the (N, 128, 128, 3) uint8 interim image batch.
    assert seen["caps"].shape == (2, 2)
    assert (det.max_faces, det.pre_topk) == pre  # auto_grow off: unchanged
    assert crops.shape[1:] == (64, 64, 3)
    assert len(crops) == len(lm) == len(idx)


def test_crop_source_validation():
    with pytest.raises(ValueError, match="crop_source"):
        FusedPipeline(
            det_model=None,
            target_landmarks=np.zeros((5, 2), np.float32),
            output_size=(8, 8),
            border_mode="constant",
            crop_source="nope",
        )
