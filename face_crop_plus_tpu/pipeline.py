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
from .ops.warp import to_uint8, warp_affine_batch


def interim_geometry(
    h: int, w: int, size: tuple[int, int]
) -> tuple[float, tuple[int, int, int, int]]:
    """Host mirror of :func:`device_resize_pad`'s static geometry.

    Returns the scale factor and (top, bottom, left, right) padding that the
    device program applies for a (h, w) source and ``size`` = (width,
    height) target — pure arithmetic, so hosts can reason about interim
    coordinates without touching device data.
    """
    tw, th = size
    if tw * h < th * w:
        scale = tw / w
        rw, rh = tw, int(h * scale)
    else:
        scale = th / h
        rw, rh = int(w * scale), th
    return scale, ((th - rh) // 2, (th - rh + 1) // 2, (tw - rw) // 2, (tw - rw + 1) // 2)


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
    scale, pad = interim_geometry(h, w, size)
    t, b, l, r = pad
    hh, ww = size[1] - t - b, size[0] - l - r

    # Zero borders fold into the resize matmuls (zero matrix rows): one HBM
    # round trip for resize+pad instead of two full-interim buffers.
    x = resize_bilinear(
        images.astype(jnp.float32), (hh, ww), pad=((t, b), (l, r))
    )
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
        enh_model=None,
        device=None,
        mesh=None,
        crop_source: str = "original",
    ):
        if crop_source not in ("original", "interim"):
            raise ValueError(f"unknown crop_source: {crop_source!r}")
        self.det = det_model
        self.enh = enh_model
        # Host numpy: a device-array constant would force a device->host
        # fetch at trace time when embedding it into the program.
        self.target = np.asarray(target_landmarks, np.float32)
        self.output_size = tuple(output_size)
        self.border_mode = border_mode
        self.allow_skew = allow_skew
        self.device = device
        self.mesh = mesh
        #: Which pixels the crops sample.  "original" (default): the
        #: original-resolution sources — better quality than the reference,
        #: which warps the detector-resolution interim images.  "interim":
        #: reference parity (cropper.py:839-843 passes the un-padded
        #: interim batch to crop_align) — use for bit-compatibility
        #: validation runs on the fused hot path.
        self.crop_source = crop_source

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    _DETECT_STATICS = (
        "self",
        "interim_h",
        "interim_w",
        "strategy",
        "vis_threshold",
        "nms_threshold",
        "max_faces",
        "pre_topk",
        "variances",
    )

    def _detect_trace(
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
        """Traced detect stage shared by the fused programs.

        uint8 (N, H, W, 3) → (face landmarks (N·K, 5, 2) in *source* image
        coordinates, validity (N·K,), cap diagnostics (N, 2)).

        ``interim_*`` is the detector resolution; when it differs from the
        input shape, resize+pad happens on device.  The detector's
        overridable knobs arrive as explicit static arguments (not read off
        ``self.det`` at trace time) so post-construction overrides take
        effect — see ``RetinaFace._detect`` for the jit-fastpath rationale.
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
        return face_lm, valid.reshape(n * k), caps, interim

    def _run_core(
        self,
        params,
        images,
        interim_h,
        interim_w,
        strategy,
        vis_threshold,
        nms_threshold,
        max_faces,
        pre_topk,
        variances,
    ):
        """Single-dispatch detect→estimate→warp (strategies best/largest).

        uint8 (N, H, W, 3) → (crops u8, landmarks f32, valid bool, caps).
        The face grid equals the image batch (K = 1), so warping every slot
        is free of waste.  With ``crop_source="original"`` (default) crops
        sample the *original-resolution* images, so no quality is lost to
        the interim resize — better than the reference, which crops from
        the 1024² interim images; ``"interim"`` reproduces the reference's
        sampling (cropper.py:839-843) for bit-compatibility runs.
        Shared trace of :meth:`_run` (RGB upload) and :meth:`_run_packed`
        (4:2:0 upload reconstructed on device).
        """
        face_lm, valid, caps, interim = self._detect_trace(
            params, images, interim_h, interim_w, strategy, vis_threshold,
            nms_threshold, max_faces, pre_topk, variances,
        )
        n = images.shape[0]
        k = face_lm.shape[0] // n

        estimate = estimate_affine if self.allow_skew else estimate_similarity
        img_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)

        h, w = images.shape[1:3]
        if self.crop_source == "interim" and (h, w) != (interim_h, interim_w):
            scale, pad = interim_geometry(h, w, (interim_w, interim_h))
            t, b, l, r = pad
            lm_i = face_lm * jnp.float32(scale)  # un-padded interim coords
            mats, ok = estimate(lm_i, self.target)
            window = jnp.asarray(
                [t, l, interim_h - t - b, interim_w - l - r], jnp.int32
            )
            windows = jnp.tile(window[None, :], (n * k, 1))
            src = jnp.clip(jnp.rint(interim), 0, 255)  # reference's uint8 interim
            crops = warp_affine_batch(
                src, mats, img_idx, self.output_size, self.border_mode, windows
            )
        else:
            mats, ok = estimate(face_lm, self.target)
            crops = warp_affine_batch(
                images, mats, img_idx, self.output_size, self.border_mode
            )
        crops = jnp.clip(jnp.rint(crops), 0, 255).astype(jnp.uint8)
        return crops, face_lm, valid & ok, caps

    @partial(jax.jit, static_argnames=_DETECT_STATICS)
    def _run(
        self,
        params,
        images,
        interim_h,
        interim_w,
        strategy,
        vis_threshold,
        nms_threshold,
        max_faces,
        pre_topk,
        variances,
    ):
        """Jitted :meth:`_run_core` over an RGB uint8 (N, H, W, 3) upload."""
        return self._run_core(
            params, images, interim_h, interim_w, strategy, vis_threshold,
            nms_threshold, max_faces, pre_topk, variances,
        )

    @partial(jax.jit, static_argnames=_DETECT_STATICS + ("src_h", "src_w"))
    def _run_packed(
        self,
        params,
        packed,
        src_h,
        src_w,
        interim_h,
        interim_w,
        strategy,
        vis_threshold,
        nms_threshold,
        max_faces,
        pre_topk,
        variances,
    ):
        """Jitted :meth:`_run_core` over a packed 4:2:0 (N, L) upload.

        Sources decoded straight to their stored YCbCr samples cross the
        host→device link at 1.5 bytes/pixel; the chroma upsample + BT.601
        inverse runs here, fused into the detect program
        (:func:`face_crop_plus_tpu.ops.yuv.yuv420_to_rgb` — within ~1
        intensity level of the host libjpeg reconstruction).
        """
        from .ops.yuv import yuv420_to_rgb

        images = yuv420_to_rgb(packed, src_h, src_w)
        return self._run_core(
            params, images, interim_h, interim_w, strategy, vis_threshold,
            nms_threshold, max_faces, pre_topk, variances,
        )

    @partial(jax.jit, static_argnames=_DETECT_STATICS + ("src_h", "src_w"))
    def _run_detect_packed(
        self,
        params,
        packed,
        src_h,
        src_w,
        interim_h,
        interim_w,
        strategy,
        vis_threshold,
        nms_threshold,
        max_faces,
        pre_topk,
        variances,
    ):
        """Detect-only program over a packed 4:2:0 upload (strategy "all").

        Also returns the device-resident RGB reconstruction so the second
        program (:meth:`_crop_selected`) warps the kept faces from it —
        the reconstruction costs HBM traffic only; nothing extra crosses
        the host link.
        """
        from .ops.yuv import yuv420_to_rgb

        images = yuv420_to_rgb(packed, src_h, src_w)
        face_lm, valid, caps, _interim = self._detect_trace(
            params, images, interim_h, interim_w, strategy, vis_threshold,
            nms_threshold, max_faces, pre_topk, variances,
        )
        return face_lm, valid, caps, images

    @partial(jax.jit, static_argnames=_DETECT_STATICS + ("src_h", "src_w"))
    def _run_detect_interim_packed(
        self,
        params,
        packed,
        src_h,
        src_w,
        interim_h,
        interim_w,
        strategy,
        vis_threshold,
        nms_threshold,
        max_faces,
        pre_topk,
        variances,
    ):
        """Packed-upload variant of :meth:`_run_detect_interim`.

        Enhancement-active batches reconstruct RGB on device and also keep
        the reconstruction resident: gated images super-resolve the interim
        while non-gated crops (``crop_source="original"``) warp the
        full-resolution reconstruction — neither recrosses the host link.
        """
        from .ops.yuv import yuv420_to_rgb

        images = yuv420_to_rgb(packed, src_h, src_w)
        face_lm, valid, caps, interim = self._detect_trace(
            params, images, interim_h, interim_w, strategy, vis_threshold,
            nms_threshold, max_faces, pre_topk, variances,
        )
        interim_u8 = jnp.clip(jnp.rint(interim), 0, 255).astype(jnp.uint8)
        return face_lm, valid, caps, interim_u8, images

    @partial(jax.jit, static_argnames=_DETECT_STATICS)
    def _run_detect(
        self,
        params,
        images,
        interim_h,
        interim_w,
        strategy,
        vis_threshold,
        nms_threshold,
        max_faces,
        pre_topk,
        variances,
    ):
        """Detect-only fused program (strategy "all"): small outputs.

        Only landmarks + masks leave the device; the host compacts the
        sparse (N, max_faces) face grid once and a second program warps
        exactly the kept faces (:meth:`_crop_selected`) — instead of
        warping all N×max_faces padded slots as one program would.
        """
        face_lm, valid, caps, _interim = self._detect_trace(
            params, images, interim_h, interim_w, strategy, vis_threshold,
            nms_threshold, max_faces, pre_topk, variances,
        )
        return face_lm, valid, caps

    @partial(jax.jit, static_argnames=_DETECT_STATICS)
    def _run_detect_interim(
        self,
        params,
        images,
        interim_h,
        interim_w,
        strategy,
        vis_threshold,
        nms_threshold,
        max_faces,
        pre_topk,
        variances,
    ):
        """Detect program that also emits the interim batch (uint8, device).

        Used when enhancement is active: the gated images' super-resolution
        and their crops consume the interim-resolution pixels (reference
        cropper.py:833-843 semantics), which stay device-resident instead of
        round-tripping through the host.
        """
        face_lm, valid, caps, interim = self._detect_trace(
            params, images, interim_h, interim_w, strategy, vis_threshold,
            nms_threshold, max_faces, pre_topk, variances,
        )
        interim_u8 = jnp.clip(jnp.rint(interim), 0, 255).astype(jnp.uint8)
        return face_lm, valid, caps, interim_u8

    @partial(jax.jit, static_argnames=("self", "lm_scale"))
    def _crop_selected(self, images, face_lm, sel_idx, lm_scale=1.0, window=None):
        """Warps the selected face rows out of device-resident images.

        Args:
            images: uint8 (N, H, W, 3) device batch (original resolution,
                or the interim batch under ``crop_source="interim"``).
            face_lm: (N·K, 5, 2) landmarks from :meth:`_run_detect` (source
                coordinates).
            sel_idx: (F,) int32 compacted face-slot indices (F is a
                power-of-two bucket; padding rows repeat a valid slot).
            lm_scale: Static source→image coordinate scale (the interim
                resize factor when cropping from the interim; 1 otherwise).
            window: Optional (4,) int32 (top, left, height, width) un-padded
                region all faces sample from (interim cropping).

        Returns:
            uint8 crops (F, Ho, Wo, 3) and a bool (F,) mask of faces whose
            transform was estimable.
        """
        k = face_lm.shape[0] // images.shape[0]
        lm = jnp.take(face_lm, sel_idx, axis=0) * jnp.float32(lm_scale)
        estimate = estimate_affine if self.allow_skew else estimate_similarity
        mats, ok = estimate(lm, self.target)
        img_idx = (sel_idx // k).astype(jnp.int32)
        windows = (
            None if window is None
            else jnp.tile(window[None, :], (lm.shape[0], 1))
        )
        crops = warp_affine_batch(
            images, mats, img_idx, self.output_size, self.border_mode, windows
        )
        return jnp.clip(jnp.rint(crops), 0, 255).astype(jnp.uint8), ok

    @partial(jax.jit, static_argnames=("self",))
    def _crop_gated(self, enhanced, lm_pad, local_idx, window):
        """Jitted estimate→warp over the enhanced interim batch.

        All inputs arrive bucketed (enhanced rows and faces padded to
        power-of-two sizes) so only O(log²) programs compile.  ``window``
        is the (top, left, height, width) un-padded interim region every
        face samples from.
        """
        estimate = estimate_affine if self.allow_skew else estimate_similarity
        mats, ok = estimate(lm_pad, self.target)
        windows = jnp.tile(window[None, :], (lm_pad.shape[0], 1))
        out = warp_affine_batch(
            enhanced, mats, local_idx, self.output_size, self.border_mode, windows
        )
        return to_uint8(out), ok

    #: Faces per crop dispatch (the warp's window gather materializes
    #: (F, Ho, Wo, 2, 2, 3) f32 — ~1.6 GB at 512 × 256²; an unbounded
    #: bucket from a crowd batch can exceed HBM outright).
    max_warp_chunk: int = 512

    # ------------------------------------------------------------------
    # Shard-local executors (mesh runs)
    #
    # Faces always index intra-shard images (the face grid of image i
    # lives on i's shard), so compaction, gated-SR gathers and warps run
    # *within* each shard via shard_map — no cross-shard gathers, no
    # collectives; one static shape per dispatch like everything else.
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnames=("self", "window"))
    def _crop_local_sharded(self, images, lm, local_idx, window=None):
        """Shard-local estimate→warp over a data-sharded image batch.

        Args:
            images: uint8 (N, H, W, 3) batch sharded over ``("data",)``.
            lm: (S·C, 5, 2) float32 landmarks, row ``s·C + p`` holding the
                landmarks of the face shard ``s`` warps at slot ``p``
                (padding slots carry the target template → identity fit).
            local_idx: (S·C,) int32 source-image index *within each
                shard's local block* of ``images``.
            window: Optional static (top, left, height, width) un-padded
                region every face samples from.

        Returns:
            uint8 crops (S·C, Ho, Wo, 3) and bool ok (S·C,), data-sharded.
        """
        from jax.sharding import PartitionSpec as P

        estimate = estimate_affine if self.allow_skew else estimate_similarity
        target = jnp.asarray(self.target)

        def body(imgs_l, lm_l, idx_l):
            mats, ok = estimate(lm_l, target)
            win = (
                None
                if window is None
                else jnp.tile(
                    jnp.asarray(window, jnp.int32)[None, :], (lm_l.shape[0], 1)
                )
            )
            crops = warp_affine_batch(
                imgs_l, mats, idx_l, self.output_size, self.border_mode, win
            )
            return to_uint8(crops), ok

        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data")),
        )(images, jnp.asarray(lm, jnp.float32), jnp.asarray(local_idx, jnp.int32))

    @partial(jax.jit, static_argnames=("self",))
    def _gather_rows_sharded(self, images, local_idx):
        """Shard-local row gather: each shard compacts its own rows.

        ``local_idx`` (S·C,) selects rows within each shard's local block;
        the result is a (S·C, ...) data-sharded array (the mesh analog of
        ``jnp.take`` along a sharded batch axis, without the collective a
        global gather would force).
        """
        from jax.sharding import PartitionSpec as P

        def body(imgs_l, idx_l):
            return jnp.take(imgs_l, idx_l, axis=0)

        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P("data"),
        )(images, jnp.asarray(local_idx, jnp.int32))

    def _crop_rows_mesh(
        self,
        src_imgs,
        lm_faces: np.ndarray,
        img_shard: np.ndarray,
        img_local: np.ndarray,
        window: tuple | None = None,
        pack: bool = False,
    ):
        """Warps faces out of a data-sharded batch, shard-locally.

        Mesh analog of :meth:`_crop_selected_chunked`: faces are grouped by
        their image's shard, padded to a uniform per-shard capacity
        (chunked by ``max_warp_chunk / S``) and warped by
        :meth:`_crop_local_sharded`; results are reassembled in face order.

        Args:
            src_imgs: uint8 (N, H, W, 3) device batch, data-sharded.
            lm_faces: (F, 5, 2) host float32 landmarks in ``src_imgs``
                coordinates (callers apply any interim scale).
            img_shard / img_local: (F,) owning shard and local image row of
                each face.
            window: Optional static (top, left, height, width) sampling
                window (interim cropping).
            pack: Fetch crops as packed 4:2:0 rows.

        Returns:
            Host crops (F, ...) in face order and a bool ok mask (F,).
        """
        from .parallel.mesh import partition_by_shard

        f = len(lm_faces)
        crops_out = np.empty(
            (f,) + self._empty_crops(pack).shape[1:], np.uint8
        )
        ok_out = np.zeros(f, bool)
        s = self.mesh.size
        cf = max(1, self.max_warp_chunk // s)
        for sel, req, rows in partition_by_shard(img_shard, img_local, s, cf):
            lm_rows = np.tile(
                np.asarray(self.target, np.float32)[None], (len(sel), 1, 1)
            )
            lm_rows[rows] = lm_faces[req]
            crops, ok = self._crop_local_sharded(src_imgs, lm_rows, sel, window)
            if pack:
                crops = self._pack_yuv(crops)
            crops_out[req] = np.asarray(crops)[rows]
            ok_out[req] = np.asarray(ok)[rows]
        return crops_out, ok_out

    @partial(jax.jit, static_argnames=("self",))
    def _pack_yuv(self, crops_u8):
        """Device-side YCbCr 4:2:0 packing of finished uint8 crops.

        The JPEG encoder's lossy front half (color convert + chroma
        subsample, :mod:`face_crop_plus_tpu.ops.yuv`) runs on device so
        JPEG-bound crops cross the device→host link at 1.5 bytes/pixel
        instead of 3 — on tunneled hosts the fetch is the e2e bottleneck.
        A separate tiny program (not fused into the detect program): it
        only runs when the save target is JPEG, and the unpacked crops
        array stays available on device for the parser handoff.
        """
        from .ops.yuv import rgb_to_yuv420

        return rgb_to_yuv420(crops_u8)

    def _crop_selected_chunked(
        self, imgs, face_lm, keep: np.ndarray, lm_scale=1.0, window=None,
        pack: bool = False,
    ):
        """Runs :meth:`_crop_selected` over ``keep`` in bounded chunks.

        Returns host crops (F, Ho, Wo, 3) — or packed 4:2:0 rows (F, L)
        with ``pack`` — an ok mask (F,), and the device crop array when a
        single dispatch covered everything (else None — the parser handoff
        only applies to the common small-face-count case)."""
        f = len(keep)
        chunk = self.max_warp_chunk
        crops_parts, ok_parts, dev_handle = [], [], None
        one_dispatch = f <= chunk
        for s in range(0, f, chunk):
            sub = keep[s : s + chunk]
            bucket = self._pow2_bucket(len(sub))
            sel = np.full(bucket, sub[-1], np.int32)
            sel[: len(sub)] = sub
            dev_crops, dev_ok = self._crop_selected(
                imgs, face_lm, jnp.asarray(sel), lm_scale, window
            )
            if one_dispatch:
                dev_handle = dev_crops
            dev_out = self._pack_yuv(dev_crops) if pack else dev_crops
            crops_parts.append(np.asarray(dev_out)[: len(sub)])
            ok_parts.append(np.asarray(dev_ok)[: len(sub)])
        return (
            np.concatenate(crops_parts),
            np.concatenate(ok_parts),
            dev_handle,
        )

    def _empty_crops(self, pack: bool) -> np.ndarray:
        if pack:
            from .ops.yuv import packed_length

            return np.zeros((0, packed_length(self.output_size)), np.uint8)
        return np.zeros((0,) + self.output_size[::-1] + (3,), np.uint8)

    def _empty_result(self, return_device_crops: bool, pack: bool = False):
        empty = self._empty_crops(pack)
        lm0 = np.zeros((0, 5, 2), np.float32)
        idx0 = np.zeros((0,), np.int64)
        return (empty, lm0, idx0, None) if return_device_crops else (empty, lm0, idx0)

    @staticmethod
    def _pow2_bucket(n: int) -> int:
        from .utils.batching import next_pow2

        return next_pow2(n)

    def _finish_enhanced(
        self, out, imgs, src_hw, interim_size, valid_n, return_device_crops,
        pack: bool = False,
    ):
        """Gate → SR → crop for the enhancement-active fused path.

        Reference semantics (cropper.py:833-843 + rrdb.py:83-146): the gate
        compares each image's mean face factor — measured in interim
        coordinates against the padded interim area — to the threshold;
        gated images are super-resolved at interim resolution and their
        crops sample the *enhanced* pixels.  Non-gated images keep this
        pipeline's quality advantage and crop from the original-resolution
        sources.  All pixel traffic (interim batch, SR input/output) stays
        on device; only landmarks, masks and final crops cross to the host.
        """
        from .models.enhancement import mean_face_factor
        from .ops.warp import to_uint8

        dev_face_lm, dev_valid, _caps, dev_interim = out
        iw, ih = interim_size
        k = dev_face_lm.shape[0] // imgs.shape[0]
        valid = np.asarray(dev_valid)[: valid_n * k]
        keep = np.nonzero(valid)[0]
        if len(keep) == 0:
            return self._empty_result(return_device_crops, pack)

        face_lm = np.asarray(dev_face_lm)[keep]  # (F, 5, 2) source coords
        indices = (keep // k).astype(np.int64)

        # Gate in interim coordinates (padding offsets cancel in the
        # landmark extents; the area is the full padded interim, matching
        # the reference's images[0].shape quirk).
        scale, pad = interim_geometry(src_hw[0], src_hw[1], interim_size)
        t, _b, l, _r = pad
        hh, ww = ih - pad[0] - pad[1], iw - pad[2] - pad[3]
        window = np.array([t, l, hh, ww], np.int32)
        factors = mean_face_factor(
            face_lm * scale, indices.tolist(), valid_n, (ih, iw)
        )
        gated = np.asarray(
            [
                i
                for i in range(valid_n)
                if np.isfinite(factors[i]) and factors[i] <= self.enh.min_face_factor
            ],
            np.int64,
        )
        is_gated = np.isin(indices, gated)

        if pack:
            from .ops.yuv import packed_length

            crops_all = np.empty(
                (len(keep), packed_length(self.output_size)), np.uint8
            )
        else:
            crops_all = np.empty(
                (len(keep),) + self.output_size[::-1] + (3,), np.uint8
            )
        ok_all = np.zeros(len(keep), bool)
        dev_handle = None

        plain_pos = np.nonzero(~is_gated)[0]
        if len(plain_pos):
            if self.mesh is not None:
                # Shard-local compaction+warp: faces index intra-shard
                # images, so no cross-shard gathers are needed.
                n_loc = imgs.shape[0] // self.mesh.size
                img_g = indices[plain_pos]
                if self.crop_source == "interim":
                    crops_p, ok_p = self._crop_rows_mesh(
                        dev_interim, face_lm[plain_pos] * np.float32(scale),
                        img_g // n_loc, img_g % n_loc,
                        tuple(int(v) for v in window), pack=pack,
                    )
                else:
                    crops_p, ok_p = self._crop_rows_mesh(
                        imgs, face_lm[plain_pos],
                        img_g // n_loc, img_g % n_loc, pack=pack,
                    )
            elif self.crop_source == "interim":
                # Reference parity: non-gated crops also sample the interim.
                crops_p, ok_p, handle = self._crop_selected_chunked(
                    dev_interim, dev_face_lm, keep[plain_pos],
                    float(scale), jnp.asarray(window), pack=pack,
                )
            else:
                crops_p, ok_p, handle = self._crop_selected_chunked(
                    imgs, dev_face_lm, keep[plain_pos], pack=pack
                )
            crops_all[plain_pos] = crops_p
            ok_all[plain_pos] = ok_p
            if self.mesh is None and len(plain_pos) == len(keep):
                dev_handle = handle

        gated_pos = np.nonzero(is_gated)[0]
        if len(gated_pos) and self.mesh is not None:
            self._finish_gated_mesh(
                dev_interim, face_lm, indices, gated, gated_pos,
                float(scale), tuple(int(v) for v in window),
                pack, crops_all, ok_all,
            )
        elif len(gated_pos):
            # SR the gated interim rows on device (sub-batched inside).
            dev_gated = jnp.take(dev_interim, jnp.asarray(gated), axis=0)
            enhanced = self.enh.enhance_device(dev_gated)

            # Pad the enhanced rows (post-SR, so padding costs no SR work)
            # and the face list to power-of-two buckets, then run one
            # jitted estimate→warp program (:meth:`_crop_gated`) — keeping
            # this off the eager path matters on remote/tunneled devices
            # where every eager dispatch is a round trip.
            g = len(gated)
            gb = self._pow2_bucket(g)
            if gb > g:
                enhanced = jnp.concatenate(
                    [enhanced, jnp.repeat(enhanced[-1:], gb - g, axis=0)]
                )
            lm_interim = (face_lm[gated_pos] * scale).astype(np.float32)
            local_of_img = {int(gi): j for j, gi in enumerate(gated)}
            local_all = np.fromiter(
                (local_of_img[int(indices[p])] for p in gated_pos),
                np.int32,
                count=len(gated_pos),
            )
            # Faces warp in bounded chunks (same HBM rationale as
            # _crop_selected_chunked).
            for s in range(0, len(gated_pos), self.max_warp_chunk):
                pos = gated_pos[s : s + self.max_warp_chunk]
                f = len(pos)
                fb = self._pow2_bucket(f)
                lm_sub = lm_interim[s : s + self.max_warp_chunk]
                lm_pad = np.concatenate(
                    [lm_sub, np.tile(lm_sub[-1:], (fb - f, 1, 1))]
                )
                local_idx = np.concatenate(
                    [
                        local_all[s : s + self.max_warp_chunk],
                        np.full(fb - f, local_all[s], np.int32),
                    ]
                )
                out_g, ok_g = self._crop_gated(
                    enhanced,
                    jnp.asarray(lm_pad),
                    jnp.asarray(local_idx),
                    jnp.asarray(window),
                )
                if pack:
                    out_g = self._pack_yuv(out_g)
                crops_all[pos] = np.asarray(out_g)[:f]
                ok_all[pos] = np.asarray(ok_g)[:f]

        crops = crops_all[ok_all]
        face_lm = face_lm[ok_all]
        indices = indices[ok_all]
        if not return_device_crops:
            return crops, face_lm, indices
        if dev_handle is not None and not ok_all.all():
            dev_handle = None
        return crops, face_lm, indices, dev_handle

    def _finish_gated_mesh(
        self,
        dev_interim,
        face_lm: np.ndarray,
        indices: np.ndarray,
        gated: np.ndarray,
        gated_pos: np.ndarray,
        scale: float,
        window: tuple,
        pack: bool,
        crops_all: np.ndarray,
        ok_all: np.ndarray,
    ) -> None:
        """Gate → SR → crop for gated images on a device mesh, shard-locally.

        Gating is per-image and images shard contiguously, so each shard
        compacts its *own* gated interim rows (:meth:`_gather_rows_sharded`),
        super-resolves them in place (the SR program partitions over the
        data axis like any batch) and warps its own faces from its local
        enhanced block (:meth:`_crop_local_sharded`) — no cross-shard
        gathers, no collectives.  Per-shard SR sub-batches are bounded by
        ``enh_batch_size / S`` (the mesh analog of the reference's
        one-image-at-a-time loop, rrdb.py:100-103) and warps by
        ``max_warp_chunk / S``.  Results land in ``crops_all``/``ok_all``
        at ``gated_pos``; semantics identical to the single-device gated
        path (reference rrdb.py:83-146 + cropper.py:833-843).
        """
        from .parallel.mesh import partition_by_shard, partition_rows_by_shard

        s = self.mesh.size
        n_pad = dev_interim.shape[0]
        cg = max(1, self.enh.enh_batch_size // s)
        chunks = partition_rows_by_shard(gated, n_pad, s, cg)

        # Image → (chunk, shard, local slot) inside that chunk's SR output.
        img_loc: dict[int, tuple[int, int, int]] = {}
        for ci, (sel, req, rows) in enumerate(chunks):
            c = len(sel) // s
            for j, r in zip(req, rows):
                img_loc[int(gated[j])] = (ci, int(r // c), int(r % c))

        ih, iw = dev_interim.shape[1:3]
        mode, strip_rows = self.enh._mode_for_shape(ih, iw)
        cf = max(1, self.max_warp_chunk // s)
        for ci, (sel, _req, _rows) in enumerate(chunks):
            dev_gated = self._gather_rows_sharded(dev_interim, sel)
            enhanced = self.enh._run_sr(dev_gated, mode, strip_rows)

            pos_c = np.asarray(
                [p for p in gated_pos if img_loc[int(indices[p])][0] == ci],
                np.int64,
            )
            if not len(pos_c):
                continue
            f_shard = np.asarray(
                [img_loc[int(indices[p])][1] for p in pos_c], np.int64
            )
            f_local = np.asarray(
                [img_loc[int(indices[p])][2] for p in pos_c], np.int64
            )
            lm_interim = (face_lm[pos_c] * np.float32(scale)).astype(np.float32)
            for fsel, freq, frows in partition_by_shard(f_shard, f_local, s, cf):
                lm_rows = np.tile(
                    np.asarray(self.target, np.float32)[None], (len(fsel), 1, 1)
                )
                lm_rows[frows] = lm_interim[freq]
                crops_g, ok_g = self._crop_local_sharded(
                    enhanced, lm_rows, fsel, window
                )
                if pack:
                    crops_g = self._pack_yuv(crops_g)
                out_pos = pos_c[freq]
                crops_all[out_pos] = np.asarray(crops_g)[frows]
                ok_all[out_pos] = np.asarray(ok_g)[frows]

    def process(
        self,
        images: np.ndarray,
        interim_size: tuple[int, int],
        return_device_crops: bool = False,
        valid_n: int | None = None,
        pack_crops: bool = False,
        packed_hw: tuple[int, int] | None = None,
    ):
        """Runs the fused step; returns host (crops, landmarks, indices).

        Args:
            images: Uniform uint8 (N, H, W, 3) batch (original resolution),
                or — with ``packed_hw`` — a (N, L) batch of packed planar
                YCbCr 4:2:0 rows (see ``utils.io.PackedYUVImage``).
            interim_size: Detector (width, height).
            return_device_crops: Additionally return the compacted crops as
                a device array (padded to a power-of-two face bucket) so a
                downstream device consumer (the parser) can skip the
                host→device re-upload.
            valid_n: Number of leading real rows when the caller padded the
                batch to a fixed size (rows beyond it are duplicates whose
                faces must not surface — and, with enhancement active, must
                not be super-resolved).  Defaults to the full batch.
            pack_crops: Fetch crops as device-packed YCbCr 4:2:0 rows
                (F, L) instead of RGB (F, Ho, Wo, 3) — half the
                device→host bytes for JPEG-bound crops (the save path
                feeds the planes straight to the native raw-data encoder).
                Callers gate on even output dims + JPEG targets; composes
                with ``return_device_crops`` (the device handle stays RGB
                for the parser — only the host-bound save copy is packed).
            packed_hw: Source (height, width) when ``images`` is a packed
                4:2:0 batch; RGB reconstruction then runs on device inside
                the detect program (the strategy-"all" and enhancement
                paths warp plain crops from the device-resident
                reconstruction).  Not supported with
                ``crop_source="interim"`` — callers gate.

        Returns:
            Compacted uint8 crops (F, Ho, Wo, 3), float32 landmarks
            (F, 5, 2) in source coordinates, and face→image indices (F,);
            with ``return_device_crops`` a 4th element: the device crop
            array of bucketed length F' >= F (rows beyond F are padding),
            or None when no device handle is available.

        Execution strategy: for "best"/"largest" (one face slot per image)
        a single program detects and warps in one dispatch.  For "all" the
        (N, max_faces) face grid is sparse, so a detect-only program
        returns landmarks + masks, the host compacts once, and a second
        program warps exactly the kept faces from the still-device-resident
        images — two dispatches, no wasted warps, no image re-upload.
        """
        n = images.shape[0]
        caller_valid = n if valid_n is None else min(int(valid_n), n)
        iw, ih = interim_size
        if self.mesh is not None:
            from .parallel.mesh import pad_to_multiple, shard_batch

            padded, mesh_valid = pad_to_multiple(np.asarray(images), self.mesh.size)
            valid_n = min(caller_valid, mesh_valid)
            imgs = shard_batch(padded, self.mesh)
        else:
            valid_n = caller_valid
            imgs = jnp.asarray(images)
            if self.device is not None:
                imgs = jax.device_put(imgs, self.device)

        # On a mesh, compaction/gating gathers run *shard-locally* (faces
        # index intra-shard images), so the two-program "all" path and the
        # gated-enhancement path work there too — see _crop_rows_mesh /
        # _finish_gated_mesh.
        enhanced = self.enh is not None
        two_program = self.det.strategy == "all"
        uses_interim = enhanced or (two_program and self.crop_source == "interim")
        if uses_interim:
            run = self._run_detect_interim
        elif two_program:
            run = self._run_detect
        else:
            run = self._run

        if packed_hw is not None and (
            (enhanced or two_program) and self.crop_source == "interim"
        ):
            raise ValueError(
                "packed_hw supports crop_source='original' only on the "
                "two-program and enhancement paths"
            )

        from .ops.anchors import anchor_grid as _grid

        def dispatch(args):
            if packed_hw is not None:
                if enhanced:
                    pr = self._run_detect_interim_packed
                elif two_program:
                    pr = self._run_detect_packed
                else:
                    pr = self._run_packed
                out = pr(
                    self.det.params, imgs, packed_hw[0], packed_hw[1],
                    ih, iw, **args,
                )
                # caps sit at index 2 for the packed detect-only programs
                # (outputs after them stay device-resident: the interim
                # and/or RGB reconstruction) and last for the
                # single-dispatch program.
                return out, (out[2] if enhanced or two_program else out[-1])
            out = run(self.det.params, imgs, ih, iw, **args)
            # _run / _run_detect return caps last; _run_detect_interim
            # (any reason it was selected: enhancement, or two-program
            # "all" with crop_source="interim") appends the interim batch
            # after the caps at index 2.
            return out, (out[2] if uses_interim else out[-1])

        out = self.det.dispatch_with_growth(dispatch, len(_grid(ih, iw)), valid_n)

        if enhanced:
            src_imgs, src_hw = imgs, images.shape[1:3]
            if packed_hw is not None:
                # Plain (non-gated) crops warp the device-resident RGB
                # reconstruction; the gate geometry uses the true source
                # size (the packed batch is (N, L)).
                src_imgs, src_hw = out[4], packed_hw
                out = out[:4]
            return self._finish_enhanced(
                out, src_imgs, src_hw, (iw, ih), valid_n,
                return_device_crops, pack=pack_crops,
            )

        if two_program:
            dev_face_lm, dev_valid = out[0], out[1]
            k = dev_face_lm.shape[0] // imgs.shape[0]
            valid = np.asarray(dev_valid)[: valid_n * k]
            keep = np.nonzero(valid)[0]
            if len(keep) == 0:
                return self._empty_result(return_device_crops, pack_crops)

            # Warp the kept set in bounded power-of-two chunks; padding rows
            # repeat the last kept slot and are dropped below.
            src_imgs, lm_scale, window_t = imgs, 1.0, None
            if packed_hw is not None:
                src_imgs = out[3]  # device-resident RGB reconstruction
            if self.crop_source == "interim":
                h, w = images.shape[1:3]
                if (h, w) != (ih, iw):
                    scale, pad = interim_geometry(h, w, interim_size)
                    t, b, l, r = pad
                    src_imgs = out[3]  # the detect program's uint8 interim
                    lm_scale = float(scale)
                    window_t = (t, l, ih - t - b, iw - l - r)
            if self.mesh is not None:
                # Shard-local compaction: each shard warps exactly its own
                # kept faces (work ∝ real faces, not N×max_faces slots).
                n_loc = src_imgs.shape[0] // self.mesh.size
                img_g = keep // k
                lm_keep = (
                    np.asarray(dev_face_lm)[keep] * np.float32(lm_scale)
                ).astype(np.float32)
                crops_k, ok = self._crop_rows_mesh(
                    src_imgs, lm_keep, img_g // n_loc, img_g % n_loc,
                    window_t, pack=pack_crops,
                )
                dev_handle = None
            else:
                window = None if window_t is None else jnp.asarray(
                    window_t, jnp.int32
                )
                crops_k, ok, dev_handle = self._crop_selected_chunked(
                    src_imgs, dev_face_lm, keep, lm_scale, window,
                    pack=pack_crops,
                )
            crops = crops_k[ok]
            face_lm = np.asarray(dev_face_lm)[keep][ok]
            indices = (keep[ok] // k).astype(np.int64)
            if not return_device_crops:
                return crops, face_lm, indices
            # The crop program's output is already compacted; hand it to the
            # parser unless degenerate transforms punched holes in it (rare)
            # or the set needed multiple chunks.
            dev_compact = dev_handle if ok.all() else None
            return crops, face_lm, indices, dev_compact

        dev_crops, face_lm, dev_valid = out[0], out[1], out[2]
        dev_fetch = self._pack_yuv(dev_crops) if pack_crops else dev_crops
        for arr in (dev_fetch, face_lm, dev_valid):
            # Start device→host copies eagerly so they overlap with other
            # in-flight batches (np.asarray below then completes them).
            try:
                arr.copy_to_host_async()
            except (AttributeError, RuntimeError):  # pragma: no cover
                pass

        k = dev_valid.shape[0] // imgs.shape[0]
        crops = np.asarray(dev_fetch)[: valid_n * k]
        face_lm = np.asarray(face_lm)[: valid_n * k]
        valid = np.asarray(dev_valid)[: valid_n * k]

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

    def detect_only(
        self,
        images: np.ndarray,
        interim_size: tuple[int, int],
        valid_n: int | None = None,
        packed_hw: tuple[int, int] | None = None,
    ):
        """Detect-only dispatch for the host-crop execution mode.

        Measured on a v5e (tools/warp_levers.py): XLA's gather-based warp
        costs ~80 ms per 16×256² crops — more than the whole ResNet-50
        detector at 1024² (~51 ms) — while the native AVX2 host warp does
        the same crops in ~4 ms.  When nothing downstream consumes device
        crops (no enhancement, no parser device-handoff), the Cropper
        therefore runs this detect-only program and warps on the host:
        the device drops to pure NN work and only landmarks/validity
        cross the link.

        With ``packed_hw``, ``images`` is a (N, L) batch of packed YCbCr
        4:2:0 rows (1.5 B/px on the wire — the host-crop counterpart of
        the packed detect paths): the RGB reconstruction for detection
        runs on device inside the program, and the caller reconstructs
        the warp sources on the host with the bit-identical numpy twin.

        Returns:
            Tuple of float32 landmarks (F, 5, 2) in source coordinates and
            int64 face→image indices (F,), host-compacted.
        """
        return self.detect_only_finish(
            self.detect_only_async(images, interim_size, valid_n, packed_hw)
        )

    def detect_only_async(
        self,
        images: np.ndarray,
        interim_size: tuple[int, int],
        valid_n: int | None = None,
        packed_hw: tuple[int, int] | None = None,
    ) -> dict:
        """Dispatch half of :meth:`detect_only`; returns an in-flight handle.

        Uploads, dispatches the detect-only program and starts the async
        device→host copies, but never blocks on a fetch — JAX dispatch is
        asynchronous, so the call returns as soon as the work is enqueued.
        Pipelined callers (``Cropper.process_images_stream``) dispatch
        batch k+1 before collecting batch k, overlapping the link upload
        and device execution with the previous batch's fetch and host
        warp.  Pass the handle to :meth:`detect_only_finish`.
        """
        n = images.shape[0]
        caller_valid = n if valid_n is None else min(int(valid_n), n)
        iw, ih = interim_size
        if self.mesh is not None:
            from .parallel.mesh import pad_to_multiple, shard_batch

            padded, mesh_valid = pad_to_multiple(np.asarray(images), self.mesh.size)
            valid_n = min(caller_valid, mesh_valid)
            imgs = shard_batch(padded, self.mesh)
        else:
            valid_n = caller_valid
            imgs = jnp.asarray(images)
            if self.device is not None:
                imgs = jax.device_put(imgs, self.device)

        from .ops.anchors import anchor_grid as _grid

        def dispatch(args):
            if packed_hw is not None:
                out = self._run_detect_packed(
                    self.det.params, imgs, packed_hw[0], packed_hw[1],
                    ih, iw, **args,
                )
                # drop the device RGB reconstruction (out[3]): detection
                # already consumed it and the host warps its own twin
                return out[:3], out[2]
            out = self._run_detect(self.det.params, imgs, ih, iw, **args)
            return out, out[-1]

        args = self.det._detect_args()
        out, caps = dispatch(args)
        for arr in (*out, caps):
            try:
                arr.copy_to_host_async()
            except (AttributeError, RuntimeError):  # pragma: no cover
                pass
        return {
            "out": out,
            "caps": caps,
            "args": args,
            "dispatch": dispatch,
            "n_anchors": len(_grid(ih, iw)),
            "valid_n": valid_n,
            "n_padded": imgs.shape[0],
        }

    def detect_only_finish(self, handle: dict):
        """Collects a :meth:`detect_only_async` handle → (landmarks, indices).

        Blocks on the caps fetch, resumes the (rare) cap-growth retries
        through the same policy as the synchronous path
        (``detection.finish_growth``), then compacts the padded device
        output at the host boundary exactly like :meth:`detect_only`.
        """
        valid_n = handle["valid_n"]
        face_lm, dev_valid, _caps = self.det.finish_growth(
            handle["out"], handle["caps"], handle["args"],
            handle["dispatch"], handle["n_anchors"], valid_n,
        )
        k = dev_valid.shape[0] // handle["n_padded"]
        valid = np.asarray(dev_valid)[: valid_n * k]
        keep = np.nonzero(valid)[0]
        lm = np.asarray(face_lm)[keep].astype(np.float32)
        return lm, (keep // k).astype(np.int64)
