"""Fused device pipeline: one XLA program per batch for the hot path.

The orchestration layer (:mod:`face_crop_plus_tpu.cropper`) composes jitted
stages with host work in between, which is flexible but pays a host↔device
round trip per stage.  On TPU — especially behind high-latency interconnects
— the winning layout is a single compiled program per image batch:

    uint8 images ──▶ [resize+pad → detect → NMS/strategy → similarity
                      estimate → warp crop → uint8 crops] ──▶ crops

Only raw uint8 images go up and only uint8 crops (plus tiny landmark/valid
arrays) come down.  For strategies "best"/"largest" the face batch equals
the image batch, so the whole program is static with zero host compaction;
for "all" the padded (N, K) face grid is cropped on device and compacted on
the host afterwards.

This module also provides the device-side batching (`resize+pad`) that
replaces host cv2 resizing: images are uploaded at their *bucket* size (the
decoded size rounded up to a small set of buckets) and brought to the model
resolution on device — for small-image datasets (e.g. CelebA at 178×218 vs
a 1024² interim size) this cuts host→device traffic by orders of magnitude.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .models.detection import _BGR_MEAN, decode_detections, retinaface_forward
from .ops.anchors import anchor_grid
from .ops.nms import select_faces
from .ops.nn import Params, resize_bilinear
from .ops.transform import estimate_affine, estimate_similarity
from .ops.warp import warp_affine_batch


def device_resize_pad(
    images: jnp.ndarray, size: tuple[int, int]
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device-side equivalent of host ``as_batch`` geometry (uniform batch).

    Aspect-preserving resize of a uniform (N, H, W, C) batch so it fits in
    ``size`` (width, height), centered with zero padding.  Returns the
    padded batch, the un-scale factor (scalar, shared: uniform inputs) and
    the (top, bottom, left, right) padding (shared).

    Geometry matches ``utils.batching.as_batch`` (reference utils.py:273-342)
    up to the interpolation kernel (device bilinear vs host cv2 area/cubic).
    """
    n, h, w, c = images.shape
    tw, th = size
    ratio_w, ratio_h = tw / w, th / h
    if ratio_w < ratio_h:
        scale = ratio_w
        ww, hh = tw, int(h * ratio_w)
        pad = ((th - hh) // 2, (th - hh + 1) // 2, 0, 0)
    else:
        scale = ratio_h
        ww, hh = int(w * ratio_h), th
        pad = (0, 0, (tw - ww) // 2, (tw - ww + 1) // 2)

    x = resize_bilinear(images.astype(jnp.float32), (hh, ww))
    t, b, l, r = pad
    x = jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))
    return x, jnp.float32(scale), jnp.asarray(pad, jnp.int32)


class FusedPipeline:
    """Single-dispatch detect→align→crop executor for uniform batches.

    Built once per Cropper configuration; jit-compiles one program per
    (batch, height, width) signature encountered.
    """

    def __init__(
        self,
        det_model,
        target_landmarks: np.ndarray,
        output_size: tuple[int, int],
        border_mode: str,
        allow_skew: bool = False,
        device=None,
        mesh=None,
    ):
        self.det = det_model
        self.target = jnp.asarray(target_landmarks, jnp.float32)
        self.output_size = tuple(output_size)
        self.border_mode = border_mode
        self.allow_skew = allow_skew
        self.device = device
        self.mesh = mesh

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    @partial(
        jax.jit,
        static_argnames=(
            "self",
            "interim_h",
            "interim_w",
            "strategy",
            "vis_threshold",
            "nms_threshold",
            "max_faces",
            "pre_topk",
            "variances",
        ),
    )
    def _run(
        self,
        params: dict,
        images: jnp.ndarray,
        interim_h: int,
        interim_w: int,
        strategy: str,
        vis_threshold: float,
        nms_threshold: float,
        max_faces: int,
        pre_topk: int,
        variances: tuple,
    ):
        """uint8 (N, H, W, 3) → (crops u8, landmarks f32, valid bool).

        The detector's overridable knobs arrive as explicit static
        arguments (not read off ``self.det`` at trace time) so that
        post-construction overrides take effect — see
        ``RetinaFace._detect`` for the jit-fastpath rationale.

        ``interim_*`` is the detector resolution; when it differs from the
        input shape, resize+pad happens on device.  Crop warping always
        samples from the *original-resolution* images (windowed to the
        un-padded region at detector scale), so no quality is lost to the
        interim resize — better than the reference, which crops from the
        1024² interim images (cropper.py:839-843).
        """
        p = Params(params)
        n, h, w, _ = images.shape

        if (h, w) != (interim_h, interim_w):
            interim, scale, pad = device_resize_pad(images, (interim_w, interim_h))
        else:
            interim = images.astype(jnp.float32)
            scale = jnp.float32(1.0)
            pad = jnp.zeros((4,), jnp.int32)

        # Detection at interim resolution.
        x = interim[..., ::-1] - jnp.array(_BGR_MEAN, jnp.float32)
        x = x.astype(self.det.compute_dtype)
        scores2, loc, ldm = retinaface_forward(p, x)
        priors = jnp.asarray(anchor_grid(interim_h, interim_w))
        boxes, landms = decode_detections(
            loc, ldm, priors, (interim_h, interim_w), variances
        )
        sel, valid, caps = select_faces(
            scores2[..., 1].astype(jnp.float32),
            boxes,
            landms,
            vis_threshold=vis_threshold,
            nms_threshold=nms_threshold,
            pre_topk=pre_topk,
            max_faces=max_faces,
            strategy=strategy,
            use_pallas=getattr(self.det, "use_pallas", False),
        )  # sel: (N, K, 10), valid: (N, K), caps: (N, 2)

        k = sel.shape[1]
        face_lm = sel.reshape(n * k, 5, 2)

        # Landmarks back to source-image coordinates: un-pad, un-scale.
        face_lm = (face_lm - pad[None, None, jnp.array([2, 0])]) / scale

        estimate = estimate_affine if self.allow_skew else estimate_similarity
        mats, ok = estimate(face_lm, self.target)
        img_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)

        crops = warp_affine_batch(
            images, mats, img_idx, self.output_size, self.border_mode
        )
        crops = jnp.clip(jnp.rint(crops), 0, 255).astype(jnp.uint8)

        valid = valid.reshape(n * k) & ok
        return crops, face_lm, valid, caps

    def process(
        self,
        images: np.ndarray,
        interim_size: tuple[int, int],
        return_device_crops: bool = False,
    ):
        """Runs the fused step; returns host (crops, landmarks, indices).

        Args:
            images: Uniform uint8 (N, H, W, 3) batch (original resolution).
            interim_size: Detector (width, height).
            return_device_crops: Additionally return the compacted crops as
                a device array (padded to a power-of-two face bucket) so a
                downstream device consumer (the parser) can skip the
                host→device re-upload.

        Returns:
            Compacted uint8 crops (F, Ho, Wo, 3), float32 landmarks
            (F, 5, 2) in source coordinates, and face→image indices (F,);
            with ``return_device_crops`` a 4th element: the device crop
            array of bucketed length F' >= F (rows beyond F are padding).
        """
        n = images.shape[0]
        iw, ih = interim_size
        if self.mesh is not None:
            from .parallel.mesh import pad_to_multiple, shard_batch

            padded, valid_n = pad_to_multiple(np.asarray(images), self.mesh.size)
            imgs = shard_batch(padded, self.mesh)
        else:
            valid_n = n
            imgs = jnp.asarray(images)
            if self.device is not None:
                imgs = jax.device_put(imgs, self.device)

        from .ops.anchors import anchor_grid as _grid

        n_anchors = len(_grid(ih, iw))
        args = self.det._detect_args()
        while True:
            dev_crops, face_lm, valid, caps = self._run(
                self.det.params, imgs, ih, iw, **args
            )
            grown = self.det.grown_args(
                np.asarray(caps)[:valid_n], args, n_anchors
            )
            if grown is None:
                break
            args = grown
            self.det.pre_topk = args["pre_topk"]
            self.det.max_faces = args["max_faces"]
        for arr in (dev_crops, face_lm, valid):
            # Start device→host copies eagerly so they overlap with other
            # in-flight batches (np.asarray below then completes them).
            try:
                arr.copy_to_host_async()
            except (AttributeError, RuntimeError):  # pragma: no cover
                pass

        k = valid.shape[0] // imgs.shape[0]
        crops = np.asarray(dev_crops)[: valid_n * k]
        face_lm = np.asarray(face_lm)[: valid_n * k]
        valid = np.asarray(valid)[: valid_n * k]

        keep = np.nonzero(valid)[0]
        indices = (keep // k).astype(np.int64)

        if not return_device_crops:
            return crops[keep], face_lm[keep], indices

        # Compact the crops on device into a power-of-two face bucket so the
        # parser consumes them without a host round trip (rows beyond
        # len(keep) repeat the last valid face and are dropped by callers).
        f = max(len(keep), 1)
        bucket = 1
        while bucket < f:
            bucket *= 2
        sel = np.zeros(bucket, np.int64)
        sel[: len(keep)] = keep
        if len(keep):
            sel[len(keep) :] = keep[-1]
        dev_compact = jnp.take(dev_crops, jnp.asarray(sel), axis=0)
        return crops[keep], face_lm[keep], indices, dev_compact
