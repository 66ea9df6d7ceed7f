"""Pipeline orchestration: read → detect → enhance → align/crop → parse → save.

This is the TPU-native counterpart of the reference's ``Cropper``
(``src/face_crop_plus/cropper.py``), keeping the same public API
(``__init__`` config surface, ``process_dir``, ``process_batch``,
``crop_align``, ``save_group``, ``save_groups``) and on-disk output layout,
while restructuring the execution for XLA:

* All per-face host loops (transform estimation, warping) are replaced by
  batched device ops (:mod:`face_crop_plus_tpu.ops`).
* Images are padded/resized on the host into fixed-shape batches; faces are
  carried as padded arrays + validity masks on device and compacted once on
  the host boundary.
* Neural models (detector/enhancer/parser) are pure-function JAX models that
  jit once per shape bucket.
* File decode/encode stays on the host; a thread pool overlaps host I/O with
  device compute (the reference's ThreadPool idea, cropper.py:900-909).
"""

from __future__ import annotations

import os
import threading
from collections import defaultdict
from functools import partial
from multiprocessing.pool import ThreadPool

import numpy as np

from .ops.transform import estimate_affine, estimate_similarity
from .ops.warp import to_uint8, warp_affine_batch
from .utils.batching import as_batch
from .utils.io import imwrite, read_images
from .utils.landmarks import (
    make_target_landmarks,
    parse_landmarks_file,
    reduce_landmarks,
)
from .utils.profiling import PipelineStats


def _resolve_device(device):
    """Resolves a device spec ("auto"/"tpu"/"cpu"/"tpu:0"/jax.Device)."""
    import jax

    if device is None or device == "auto":
        return jax.devices()[0]  # default backend: TPU when present
    if not isinstance(device, str):
        return device
    if ":" in device:
        backend, idx = device.split(":")
        return jax.devices(backend)[int(idx)]
    return jax.devices(device)[0]


class Cropper:
    """Face cropper: alignment/cropping, quality enhancement, parsing.

    Same capabilities and configuration surface as the reference ``Cropper``
    (cropper.py:26-156), with the execution restructured for TPU.

    Capabilities
    ------------

    1. **Face cropping** — faces are aligned and center-cropped from
       5-point landmarks, either predicted by the RetinaFace detector or
       supplied via a landmarks file/arrays (``landmarks=``; detection is
       then skipped entirely).  ``face_factor`` controls how much of the
       crop the face occupies; ``strategy`` picks which faces to extract
       per image ("all"/"best"/"largest"); ``padding`` selects the border
       mode for crop regions outside the source.
    2. **Quality enhancement** — images whose mean face-area fraction is at
       or below ``enh_threshold`` are super-resolved 4x (RRDBNet/BSRGAN)
       and downscaled back, removing blur.  With no landmarks and no
       detection, every image is enhanced.
    3. **Face parsing** — crops are segmented into 19 face attributes
       (BiSeNet) and grouped into attribute subdirectories
       (``attr_groups={"glasses": [6], "no_accessories": [-6, -9, -15, -18]}``,
       negative = must be absent, AND-joined) and/or mask groups
       (``mask_groups={"eyes": [4, 5]}``) that additionally write binary
       0/255 masks to ``<name>_mask`` directories.

    Examples
    --------

    Automatic cropping with enhancement::

        cropper = Cropper(face_factor=0.7, enh_threshold=0.01)
        cropper.process_dir("path/to/images")

    Very fast cropping with known landmarks (no models)::

        cropper = Cropper(landmarks="landmarks.txt", num_processes=16,
                          det_threshold=None, enh_threshold=None)
        cropper.process_dir("path/to/images")

    Grouping by attributes and generating masks::

        cropper = Cropper(attr_groups={"glasses": [6]},
                          mask_groups={"eyes": [4, 5]},
                          output_format="png")
        cropper.process_dir("path/to/images", "path/to/out")

    Attributes
    ----------

    ``det_model`` / ``enh_model`` / ``par_model`` — the three lazily
    constructed models (None when their feature is disabled);
    ``landmarks_target`` — the face-factor-scaled 5-point template;
    ``stats`` — per-stage wall-time accounting
    (:class:`~face_crop_plus_tpu.utils.profiling.PipelineStats`).

    TPU-specific extras (all optional, sensible defaults):

    Args (additional to the reference's):
        max_faces: Upper bound of faces kept per image when
            ``strategy="all"`` (XLA needs a static bound). Defaults to 64.
        pre_topk: Static per-image candidate cap before NMS. Defaults
            to 256.
        auto_grow: Grow ``pre_topk``/``max_faces`` on demand (with a
            recompile) when a crowd image overflows them, preserving the
            reference's uncapped semantics. Defaults to True; when off (or
            at the growth ceiling) a binding cap warns once.
        max_fused_shapes: How many distinct source-image shapes may receive
            their own fused single-dispatch device program (each costs one
            XLA compile); further shapes use the staged path. Defaults to 4.
        weights_dir: Directory holding converted model weights (as produced
            by :mod:`face_crop_plus_tpu.models.weights`). If None, a default
            cache location is probed; missing weights fall back to random
            initialization with a warning (useful for benchmarks/tests).
        mesh: Optional :class:`jax.sharding.Mesh` over a ``"data"`` axis; if
            given, device batches are sharded across it (data parallelism
            over images — the natural scaling axis for this workload).
    """

    def __init__(
        self,
        output_size: int | tuple[int, int] | list[int] = 256,
        output_format: str | None = None,
        resize_size: int | tuple[int, int] | list[int] = 1024,
        face_factor: float = 0.65,
        strategy: str = "largest",
        padding: str = "constant",
        allow_skew: bool = False,
        landmarks: str | tuple[np.ndarray, np.ndarray] | None = None,
        attr_groups: dict[str, list[int]] | None = None,
        mask_groups: dict[str, list[int]] | None = None,
        det_threshold: float | None = 0.6,
        enh_threshold: float | None = None,
        batch_size: int = 8,
        num_processes: int = 1,
        device: str | None = "auto",
        max_faces: int = 64,
        pre_topk: int = 256,
        auto_grow: bool = True,
        max_fused_shapes: int = 4,
        weights_dir: str | None = None,
        mesh=None,
        crop_source: str = "original",
    ):
        self.output_size = output_size
        self.output_format = output_format
        self.resize_size = resize_size
        self.face_factor = face_factor
        self.strategy = strategy
        self.padding = padding
        self.allow_skew = allow_skew
        self.landmarks = landmarks
        self.attr_groups = attr_groups
        self.mask_groups = mask_groups
        self.det_threshold = det_threshold
        self.enh_threshold = enh_threshold
        self.batch_size = batch_size
        self.num_processes = num_processes
        self.device = device
        self.max_faces = max_faces
        self.pre_topk = pre_topk
        self.auto_grow = auto_grow
        self.max_fused_shapes = max_fused_shapes
        self.weights_dir = weights_dir
        self.mesh = mesh
        #: Pixels the fused path's crops sample: "original" (default)
        #: warps the original-resolution sources — higher quality than the
        #: reference, which warps the detector-resolution interim
        #: (cropper.py:839-843); "interim" reproduces the reference's
        #: sampling so bit-compatibility runs can use the fused hot path
        #: (the staged path always crops from the interim).  See
        #: docs/migration.md.
        self.crop_source = crop_source

        self.num_std_landmarks = 5

        if isinstance(self.output_size, int):
            self.output_size = (self.output_size, self.output_size)
        if len(self.output_size) == 1:
            self.output_size = (self.output_size[0], self.output_size[0])
        self.output_size = tuple(self.output_size)

        if isinstance(self.resize_size, int):
            self.resize_size = (self.resize_size, self.resize_size)
        if len(self.resize_size) == 1:
            self.resize_size = (self.resize_size[0], self.resize_size[0])
        self.resize_size = tuple(self.resize_size)

        if isinstance(self.landmarks, str):
            self.landmarks = parse_landmarks_file(self.landmarks)

        #: Per-stage wall-time accounting (read ``self.stats.report()`` after
        #: a run; the reference offers no observability beyond progress bars).
        self.stats = PipelineStats()

        # Persistent XLA program cache: reruns of the same configuration
        # skip backend compilation entirely (see utils/cache.py).
        from .utils.cache import enable_compilation_cache

        enable_compilation_cache()

        self._device = _resolve_device(self.device)

        # Remote accelerators pay a large one-time per-process session
        # establishment cost on the first output fetch; overlap it with
        # model init / tracing / first decode (see utils/prewarm.py).
        # Pure-host configurations (no detector/enhancer/parser) never
        # fetch a program output, so establishing a session would be pure
        # waste — and a fetch still in flight at process exit is unsafe.
        # Mirrors _init_models exactly: precomputed landmarks suppress the
        # detector even when det_threshold keeps its default.
        if (
            (self.det_threshold is not None and self.landmarks is None)
            or self.enh_threshold is not None
            or self.attr_groups is not None
            or self.mask_groups is not None
        ):
            from .utils.prewarm import start as _prewarm_start

            _prewarm_start(self._device)

        self._init_models()
        self._init_landmarks_target()
        self._init_fused()

    def _init_fused(self):
        """Builds the fused device executor for the detection-active paths.

        One upload per batch; detect (and, when configured, the gate→SR→crop
        chain for enhanced images) runs on device-resident pixels; only
        crops and small landmark/valid arrays come down.  On a mesh the
        compaction/gating gathers run shard-locally (faces index intra-shard
        images) — see ``FusedPipeline._crop_rows_mesh`` /
        ``_finish_gated_mesh`` — so every configuration keeps the fused hot
        path.
        """
        self._fused = None
        #: Source shapes granted a fused program (bounded: each distinct
        #: shape compiles its own XLA program, so only the first
        #: ``max_fused_shapes`` frequent shapes get one; everything else
        #: uses the classic staged path with host resizing).
        self._fused_shapes: set = set()
        self._fused_shapes_lock = threading.Lock()
        if self.det_model is not None:
            from .pipeline import FusedPipeline

            self._fused = FusedPipeline(
                det_model=self.det_model,
                target_landmarks=self.landmarks_target,
                output_size=self.output_size,
                border_mode=self.padding,
                allow_skew=self.allow_skew,
                enh_model=self.enh_model,
                device=self._device,
                mesh=self.mesh,
                crop_source=self.crop_source,
            )

    def _host_crop_enabled(self) -> bool:
        """Whether detection-mode crops should be warped on the host.

        XLA lowers the warp's per-pixel window gather to an effectively
        scalar path: measured on a v5e (tools/warp_levers.py, all
        formulations), 16×256² crops cost ~80 ms on device — more than the
        whole 1024² ResNet-50 detect program (~51 ms) — while the native
        AVX2 host kernel warps them in ~4 ms.  So when nothing downstream
        needs device-resident crops, the TPU runs a detect-only program and
        the host warps from the already-decoded sources (the reference also
        warps on the host, cropper.py:514-547; ours is batched + threaded).

        ``FCPT_HOST_CROP`` forces the choice: "1" on, "0" off; default
        "auto" = on when the native warp kernel is available (the host
        numpy fallback would beat the device gather too, but the native
        kernel is what makes this a clear win on every backend).  Callers
        additionally gate on: no enhancement (gated crops sample the
        device-resident enhanced interim), no parser device-handoff, and
        ``crop_source="original"`` (the interim exists only on device).
        Packed 4:2:0 uploads compose: detection reads the device
        reconstruction while the host warps either the numpy-twin RGB
        reconstruction or — when :meth:`_host_yuv_rows_ok` grants it —
        straight from the stored planes into packed crop rows for the
        raw-data encoder.  Meshes keep the device path
        (shard-local warps scale with the mesh; the host would serialize).
        """
        env = os.environ.get("FCPT_HOST_CROP", "auto")
        if env == "0":
            return False
        if self.mesh is not None or self.crop_source != "original":
            return False
        if env == "1":
            return True
        from .utils.native_io import native_warp_available

        return native_warp_available(self.padding)

    def _fused_eligible(self, shape, count: int) -> bool:
        """Grants/uses a fused program for a source shape (bounded set).

        Locked: worker threads race on check-then-add, and an over-admitted
        shape means an extra compiled program beyond ``max_fused_shapes``.
        """
        if self._fused is None:
            return False
        with self._fused_shapes_lock:
            if shape in self._fused_shapes:
                return True
            if (
                len(self._fused_shapes) < self.max_fused_shapes
                and count >= max(2, self.batch_size // 2)
            ):
                self._fused_shapes.add(shape)
                return True
        return False

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------

    def _init_models(self):
        """Lazily constructs the three models as demanded by the config.

        Mirrors reference cropper.py:346-390: the detector exists only when
        ``det_threshold`` is set and no landmarks are provided; the enhancer
        when ``enh_threshold`` is set; the parser when any grouping is
        requested.  JAX models are stateless param pytrees, so unlike the
        reference there is no per-worker re-initialization: the params are
        shared read-only across host threads.
        """
        self.det_model = None
        self.enh_model = None
        self.par_model = None

        if self.det_threshold is not None and self.landmarks is None:
            from .models.detection import RetinaFace

            self.det_model = RetinaFace(
                strategy=self.strategy,
                vis=self.det_threshold,
                max_faces=self.max_faces,
                pre_topk=self.pre_topk,
                auto_grow=self.auto_grow,
                weights_dir=self.weights_dir,
                device=self._device,
                mesh=self.mesh,
            )

        if self.enh_threshold is not None:
            from .models.enhancement import RRDBNet

            self.enh_model = RRDBNet(
                min_face_factor=self.enh_threshold,
                weights_dir=self.weights_dir,
                device=self._device,
                mesh=self.mesh,
            )

        if self.attr_groups is not None or self.mask_groups is not None:
            from .models.parsing import BiSeNet

            self.par_model = BiSeNet(
                attr_groups=self.attr_groups,
                mask_groups=self.mask_groups,
                max_batch_size=self.batch_size,
                weights_dir=self.weights_dir,
                device=self._device,
                mesh=self.mesh,
            )

    def _init_landmarks_target(self):
        """Builds the scaled/centered 5-point alignment target template."""
        self.landmarks_target = make_target_landmarks(
            self.output_size, self.face_factor, self.num_std_landmarks
        )

    # ------------------------------------------------------------------
    # Core geometry
    # ------------------------------------------------------------------

    def _estimate(self, landmarks_source: np.ndarray):
        """Batched transform estimation for all faces at once.

        Pure-host pipelines (no detector/enhancer) use the numpy twins —
        the math is microseconds of arithmetic, and a jitted estimate
        would pay an upload/compute/fetch round trip per batch when an
        accelerator is attached.
        """
        if self.det_model is None and self.enh_model is None:
            from .ops.transform import estimate_affine_np, estimate_similarity_np

            fit = estimate_affine_np if self.allow_skew else estimate_similarity_np
            return fit(landmarks_source, np.asarray(self.landmarks_target))
        if self.allow_skew:
            return estimate_affine(landmarks_source, self.landmarks_target)
        return estimate_similarity(landmarks_source, self.landmarks_target)

    def crop_align(
        self,
        images: np.ndarray | list[np.ndarray],
        padding: np.ndarray | None,
        indices: list[int] | np.ndarray,
        landmarks_source: np.ndarray,
    ) -> np.ndarray:
        """Aligns and center-crops all faces in one batched device pass.

        Functionally equivalent to reference cropper.py:441-552 (per-face
        ``cv2.estimateAffine*`` + ``cv2.warpAffine`` host loop), but runs the
        whole face batch as two fused XLA computations: closed-form transform
        estimation and a batched gather/bilinear warp.  Padding removal is
        handled algebraically via per-face sampling windows instead of host
        slicing.

        Args:
            images: (N, H, W, 3) uint8 batch, or a list of ragged uint8
                images (precomputed-landmark mode).
            padding: Optional (N, 4) per-image paddings (top, bottom, left,
                right) to exclude from sampling.
            indices: Length-F map from each face to its source image.
            landmarks_source: (F, 5, 2) float32 source landmarks in un-padded
                image coordinates.

        Returns:
            (F', Ho, Wo, 3) uint8 crops. F' <= F: faces with degenerate
            transforms are dropped (reference behavior cropper.py:529-531).
        """
        return self._align_crop_filtered(images, padding, indices, landmarks_source)[0]

    def _align_crop_filtered(
        self, images, paddings, indices, landmarks, prefer_native: bool = False
    ):
        """crop_align that also filters the indices of dropped faces.

        The reference silently drops a face whose transform could not be
        estimated but keeps its file-name index, misaligning the remaining
        names (cropper.py:529-531 + :850).  Internal callers use this
        variant, which drops crop and index together.

        ``prefer_native`` routes the warp to the native host kernel even
        with models/accelerator attached (the host-crop execution mode —
        see :meth:`_host_crop_enabled`); transform estimation then uses the
        numpy twins too, since nothing downstream needs a device array.

        Returns:
            Tuple of uint8 crops (F', Ho, Wo, 3) and int64 indices (F',).
        """
        indices = np.asarray(indices, np.int64)
        landmarks = np.asarray(landmarks, np.float32)
        if prefer_native:
            from .ops.transform import estimate_affine_np, estimate_similarity_np

            fit = estimate_affine_np if self.allow_skew else estimate_similarity_np
            matrices, valid = fit(landmarks, np.asarray(self.landmarks_target))
        else:
            matrices, valid = self._estimate(landmarks)
        pos = np.nonzero(np.asarray(valid))[0]
        if len(pos) == 0:
            return (
                np.zeros((0,) + self.output_size[::-1] + (3,), np.uint8),
                np.zeros((0,), np.int64),
            )
        indices = indices[pos]
        matrices = np.asarray(matrices)[pos]
        if isinstance(images, np.ndarray) and images.ndim == 4:
            crops = self._warp_uniform(
                images, paddings, indices, matrices, prefer_native
            )
        else:
            crops = self._warp_ragged(images, indices, matrices, prefer_native)
        return crops, indices

    #: Faces per warp dispatch: bounds the window-gather working set
    #: (~1.6 GB at 512 faces × 256² crops); larger face sets are chunked.
    max_warp_chunk: int = 512

    @staticmethod
    def _face_bucket(f: int) -> int:
        """Face counts vary per batch (NMS output); warping at power-of-two
        bucket sizes keeps the number of compiled warp programs logarithmic."""
        from .utils.batching import next_pow2

        return next_pow2(f)

    def _native_warp(self, images, matrices, indices, windows, force=False):
        """Host-native warp when no accelerator is attached (else None).

        The reference leans on cv2.warpAffine's C++ for the pure-host
        configs (landmark-only CelebA, SURVEY §2.4); this build's
        equivalent is ``native/fcpt_io.cpp::fcpt_warp_affine_u8`` — ~3x
        XLA:CPU's gather-based warp, parity within one intensity level.
        ``FCPT_NATIVE_WARP=0`` disables it.  ``force`` bypasses the
        pure-host/CPU-platform gate (the host-crop execution mode, where
        the detector runs on device but crops are host work — see
        :meth:`_host_crop_enabled`).
        """
        if self.mesh is not None or os.environ.get("FCPT_NATIVE_WARP") == "0":
            return None
        # Every caller of this helper holds *host* pixel arrays (the
        # landmark-only/no-op sources, the staged paths' host-resized
        # interim or enhancer output, the host-crop mode's originals) — a
        # device dispatch always adds an upload + warp + fetch round trip,
        # and the device warp's gather is itself slower than this kernel
        # (see _host_crop_enabled).  So the native path applies whenever
        # the host-crop policy is on; pure-host pipelines keep it even
        # when the policy knob is off-by-config (crop_source="interim"
        # etc. — their sources never touch the device at all).  The fused
        # device-resident paths (parser handoff, gated SR, interim
        # sampling) never reach this helper.
        pure_host = self.det_model is None and self.enh_model is None
        cpu_platform = self._device is not None and self._device.platform == "cpu"
        if (
            not force
            and not pure_host
            and not cpu_platform  # pre-r4 allowance: ~3x XLA:CPU's warp
            and not self._host_crop_enabled()
        ):
            return None
        from .utils.native_io import warp_affine_batch_native

        return warp_affine_batch_native(
            np.asarray(images),
            np.asarray(matrices, np.float32),
            np.asarray(indices, np.int32),
            self.output_size,
            self.padding,
            windows,
            n_threads=max(1, (os.cpu_count() or 1) // max(1, self.num_processes)),
            # 10-bit fixed-point sampling by default — the same arithmetic
            # family as the reference's cv2.warpAffine (5-bit), strictly
            # more accurate than it, and within one intensity level of the
            # exact path.  FCPT_WARP_EXACT=1 opts into exact float
            # (bit-parity with the device warp).
            exact=os.environ.get("FCPT_WARP_EXACT") == "1",
        )

    def _warp_uniform(self, images, padding, indices, matrices, prefer_native=False):
        """Warps faces out of a uniform (N, H, W, 3) batch."""
        if padding is not None:
            pad = np.asarray(padding, np.int64)
            h = images.shape[1] - pad[:, 0] - pad[:, 1]
            w = images.shape[2] - pad[:, 2] - pad[:, 3]
            windows_all = np.stack([pad[:, 0], pad[:, 2], h, w], axis=1)
            windows = windows_all[indices].astype(np.int32)
        else:
            windows = None

        native = self._native_warp(
            images, matrices, indices, windows, force=prefer_native
        )
        if native is not None:
            return native

        f = len(indices)
        # Chunk huge face sets: the warp's window gather materializes
        # (F, Ho, Wo, 2, 2, 3) f32, so an unbounded power-of-two bucket can
        # exceed HBM outright (a 1024-faces/image crowd at 256² output
        # builds a 32 GB program).  max_warp_chunk bounds the per-dispatch
        # working set (~1.6 GB at the default 512 × 256²).
        chunk = self.max_warp_chunk
        if f > chunk:
            parts = [
                self._warp_uniform(
                    images,
                    padding,
                    indices[s : s + chunk],
                    matrices[s : s + chunk],
                    prefer_native,
                )
                for s in range(0, f, chunk)
            ]
            return np.concatenate(parts, axis=0)

        fb = self._face_bucket(f)
        mats = np.concatenate(
            [matrices, np.tile(np.eye(2, 3, dtype=np.float32), (fb - f, 1, 1))]
        ).astype(np.float32)
        idx = np.concatenate([indices, np.zeros(fb - f, np.int64)]).astype(np.int32)
        if windows is not None:
            windows = np.concatenate(
                [windows, np.tile(windows[-1:], (fb - f, 1))]
            ).astype(np.int32)

        out = warp_affine_batch(
            np.asarray(images), mats, idx, self.output_size, self.padding, windows
        )
        return np.asarray(to_uint8(out))[:f]

    def _warp_ragged(self, images, indices, matrices, prefer_native=False):
        """Warps faces from ragged images, grouped by identical source shape.

        Directories are typically homogeneous (e.g. CelebA), so this usually
        compiles and runs a single bucket; mixed directories fall back to one
        device call per distinct shape.
        """
        shapes = defaultdict(list)
        for face_i, img_i in enumerate(indices):
            shapes[images[img_i].shape].append(face_i)

        crops = np.empty(
            (len(indices), self.output_size[1], self.output_size[0], 3), np.uint8
        )
        for shape, face_ids in shapes.items():
            img_ids = sorted(set(int(indices[i]) for i in face_ids))
            remap = {g: l for l, g in enumerate(img_ids)}
            stack = np.stack([images[g] for g in img_ids])
            local_idx = np.array(
                [remap[int(indices[i])] for i in face_ids], np.int32
            )
            native = self._native_warp(
                stack, matrices[face_ids], local_idx, None, force=prefer_native
            )
            if native is not None:
                crops[face_ids] = native
                continue
            # Pad the face dimension to a power-of-two bucket (bounded by
            # max_warp_chunk — see _warp_uniform): NMS/match counts vary per
            # batch, and warp_affine_batch compiles one program per concrete
            # face count otherwise.
            for s in range(0, len(face_ids), self.max_warp_chunk):
                sub = face_ids[s : s + self.max_warp_chunk]
                f = len(sub)
                fb = self._face_bucket(f)
                mats = np.concatenate(
                    [
                        matrices[sub],
                        np.tile(np.eye(2, 3, dtype=np.float32), (fb - f, 1, 1)),
                    ]
                ).astype(np.float32)
                sub_idx = np.concatenate(
                    [local_idx[s : s + self.max_warp_chunk], np.zeros(fb - f, np.int32)]
                )
                out = warp_affine_batch(
                    stack,
                    mats,
                    sub_idx.astype(np.int32),
                    self.output_size,
                    self.padding,
                )
                crops[sub] = np.asarray(to_uint8(out))[:f]
        return crops

    # ------------------------------------------------------------------
    # Saving (host)
    # ------------------------------------------------------------------

    def _packed_fetch_eligible(
        self, file_names, parser_handoff: bool = False
    ) -> bool:
        """Whether this batch's crops can come down as packed 4:2:0 rows.

        Device-packed fetches (``FusedPipeline.process(pack_crops=True)``)
        halve the device→host crop bytes but are only byte-equivalent for
        JPEG targets (the packing *is* the JPEG encoder's lossy front
        half).  Requirements: a fused pipeline, no parser consuming host
        crops (``parser_handoff`` marks batches whose parser reads the
        still-RGB *device* crop array instead — packing then only touches
        the host-bound save copy), even output dims, every output file a
        .jpg/.jpeg, the native raw-data encoder present, and a non-CPU
        backend (on the CPU backend there is no device link to save;
        override with ``FCPT_PACK_FETCH=1``/``0``).
        """
        if self._fused is None:
            return False
        if self.par_model is not None and not parser_handoff:
            return False
        w, h = self.output_size
        if w % 2 or h % 2 or w < 2 or h < 2:
            return False
        mode = os.environ.get("FCPT_PACK_FETCH", "auto")
        if mode == "0":
            return False
        if mode != "1":
            if self._device is not None:
                platform = self._device.platform
            else:
                import jax

                platform = jax.default_backend()
            if platform == "cpu":
                return False
        if self.output_format is not None:
            if self.output_format.lower() not in ("jpg", "jpeg"):
                return False
        elif not all(
            str(n).lower().endswith((".jpg", ".jpeg")) for n in file_names
        ):
            return False
        from .utils.native_io import yuv_encoder_available

        return yuv_encoder_available()

    def _packed_upload_eligible(self) -> bool:
        """Whether sources may upload as stored YCbCr 4:2:0 planes.

        Plain 4:2:0 JPEGs can skip libjpeg's chroma upsample + color
        conversion on the host and cross the host→device link at
        1.5 bytes/pixel; the reconstruction runs on device inside the
        consuming program (within ~1 intensity level of cv2.imread).
        Two families qualify:

        * fused detect paths: detection mode (any strategy — the
          strategy-"all" and gated-enhancement paths warp plain crops
          from the device-resident reconstruction; mesh runs shard the
          packed (N, L) rows over the data axis like any batch-leading
          array) with ``crop_source="original"`` (parity validation runs
          keep the exact cv2 decode);
        * the pure no-crop modes (reference README.md:200-244 — neither
          landmarks nor detector): sources feed the enhancer/parser
          directly, reconstructed inside their jitted programs.

        Both also require a non-CPU backend and the native decoder.
        ``FCPT_PACK_UPLOAD=1``/``0`` force/disable (default ``auto``).

        Composes with the host-crop mode (r4): packed sources keep the
        halved upload while detection still reconstructs on device; the
        host warp samples the bit-identical numpy-twin reconstruction of
        the same stored planes, so crops match the device-warp packed
        path within the usual bands.
        """
        fused_detect = (
            self._fused is not None
            and self.landmarks is None
            and self.det_model is not None
            and self.crop_source == "original"
        )
        pure_no_crop = (
            self.landmarks is None
            and self.det_model is None
            and (self.enh_model is not None or self.par_model is not None)
        )
        if not (fused_detect or pure_no_crop):
            return False
        mode = os.environ.get("FCPT_PACK_UPLOAD", "auto")
        if mode == "0":
            return False
        if mode != "1":
            if self._device is not None:
                platform = self._device.platform
            else:
                import jax

                platform = jax.default_backend()
            if platform == "cpu":
                return False
        from .utils.native_io import yuv_encoder_available

        return yuv_encoder_available()

    def _yuv_crop_eligible(self) -> bool:
        """Whether landmark-mode crops may run the YUV-direct pipeline.

        The reference's flagship fast path (README.md:246-275) decodes
        JPEG→RGB, warps RGB, re-encodes RGB→JPEG.  For JPEG-in/JPEG-out
        landmark cropping every step of that round trip can stay in the
        codec's native 4:2:0 space: sources decode to their stored planes
        (entropy + IDCT only — no chroma upsample, no color conversion),
        faces warp per plane (``native_io.warp_yuv420_batch_native``), and
        the packed rows feed the raw-data encoder (no RGB→YCbCr, no
        downsample).  Full-size RGB is never materialized and the warp
        moves half the bytes.  Crops sit within ~1 intensity level of the
        RGB path (the packed wire formats' documented band); luma is
        within rounding.  ``FCPT_YUV_CROP=0`` restores the RGB path;
        ``FCPT_WARP_EXACT=1`` (device-warp bit parity) disables it too.

        Per-file: only plain 4:2:0 EXIF-upright JPEG sources decode
        packed; others keep the RGB path within the same batch.
        """
        if os.environ.get("FCPT_YUV_CROP", "auto") == "0":
            return False
        if os.environ.get("FCPT_WARP_EXACT") == "1":
            return False
        if os.environ.get("FCPT_NATIVE_WARP") == "0":
            return False
        if self.landmarks is None or self.det_model is not None:
            return False
        if self.enh_model is not None or self.par_model is not None:
            return False
        if self.mesh is not None:
            return False
        if self.output_format is not None and self.output_format.lower() not in (
            "jpg",
            "jpeg",
        ):
            return False
        wo, ho = self.output_size
        if wo % 2 or ho % 2 or min(wo, ho) < 2:
            return False
        from .utils.native_io import warp_yuv420_available, yuv_encoder_available

        return yuv_encoder_available() and warp_yuv420_available(self.padding)

    def _align_crop_yuv(self, images, indices, landmarks):
        """Landmark-mode crop in packed YCbCr 4:2:0 space (see
        :meth:`_yuv_crop_eligible`).

        Packed sources warp per plane straight to packed crop rows;
        RGB entries in the same batch (non-4:2:0 / EXIF-rotated files)
        warp through the usual native RGB path.  Returns a per-face list
        (1-D packed rows and/or (Ho, Wo, 3) RGB crops, original face
        order) and the filtered int64 indices — ``save_group`` writes
        both forms.
        """
        from .ops.transform import estimate_affine_np, estimate_similarity_np
        from .utils.io import PackedYUVImage
        from .utils.native_io import warp_yuv420_batch_native

        indices = np.asarray(indices, np.int64)
        landmarks = np.asarray(landmarks, np.float32)
        fit = estimate_affine_np if self.allow_skew else estimate_similarity_np
        matrices, valid = fit(landmarks, np.asarray(self.landmarks_target))
        pos = np.nonzero(np.asarray(valid))[0]
        if len(pos) == 0:
            return [], np.zeros((0,), np.int64)
        indices = indices[pos]
        matrices = np.asarray(matrices, np.float32)[pos]
        n_threads = max(1, (os.cpu_count() or 1) // max(1, self.num_processes))
        out: list = [None] * len(indices)
        packed_face = np.array(
            [isinstance(images[i], PackedYUVImage) for i in indices], bool
        )
        rgb_ks = list(np.nonzero(~packed_face)[0])
        by_hw: defaultdict[tuple, list[int]] = defaultdict(list)
        for k in np.nonzero(packed_face)[0]:
            im = images[indices[k]]
            by_hw[(im.h, im.w)].append(int(k))
        for (h, w), ks in by_hw.items():
            uniq, local = np.unique(indices[ks], return_inverse=True)
            stack = np.stack([images[i].packed for i in uniq])
            rows = warp_yuv420_batch_native(
                stack,
                (h, w),
                matrices[ks],
                local.astype(np.int32),
                self.output_size,
                self.padding,
                n_threads=n_threads,
            )
            if rows is None:  # pragma: no cover - gated by _yuv_crop_eligible
                rgb_ks.extend(ks)
                continue
            for j, k in enumerate(ks):
                out[k] = rows[j]
        if rgb_ks:
            rgb_ks = np.asarray(sorted(int(k) for k in rgb_ks))
            # Unpack only sources this remainder actually references (all
            # are RGB already unless the native warp vanished mid-run).
            src = list(images)
            for i in set(int(indices[k]) for k in rgb_ks):
                if isinstance(src[i], PackedYUVImage):  # pragma: no cover
                    src[i] = src[i].to_rgb()
            crops = self._warp_ragged(
                src, indices[rgb_ks], matrices[rgb_ks], prefer_native=True
            )
            for j, k in enumerate(rgb_ks):
                out[int(k)] = crops[j]
        return out, indices

    def _host_yuv_rows_ok(self, file_names) -> bool:
        """Detection-mode twin of :meth:`_yuv_crop_eligible`'s output gate.

        Under host-crop with packed 4:2:0 uploads, crops can warp straight
        from the stored planes into packed rows for the raw-data encoder —
        but only when every output of the batch is a JPEG (4:2:0 packing is
        the JPEG encoder's own lossy front half) and the output dims are
        even.  The caller additionally requires ``par_model is None`` (the
        parser reads RGB crops).
        """
        if os.environ.get("FCPT_YUV_CROP", "auto") == "0":
            return False
        if os.environ.get("FCPT_WARP_EXACT") == "1":
            return False
        wo, ho = self.output_size
        if wo % 2 or ho % 2 or min(wo, ho) < 2:
            return False
        if not self._jpeg_bound(file_names):
            return False
        from .utils.native_io import warp_yuv420_available, yuv_encoder_available

        return yuv_encoder_available() and warp_yuv420_available(self.padding)

    def _align_crop_yuv_rows(self, rows, src_hw, indices, landmarks):
        """Estimate+filter+warp straight from packed source rows.

        The detection-mode YUV-direct crop: same numpy-twin transform fits
        and validity filtering as ``_align_crop_filtered(prefer_native=
        True)``, but the warp samples the stored 4:2:0 planes
        (``native_io.warp_yuv420_batch_native``) and returns packed crop
        rows (F', L) + filtered indices.  None when the native entry
        points are unavailable (caller falls back to the RGB path).
        """
        from .ops.transform import estimate_affine_np, estimate_similarity_np
        from .ops.yuv import packed_length
        from .utils.native_io import warp_yuv420_batch_native

        indices = np.asarray(indices, np.int64)
        landmarks = np.asarray(landmarks, np.float32)
        fit = estimate_affine_np if self.allow_skew else estimate_similarity_np
        matrices, valid = fit(landmarks, np.asarray(self.landmarks_target))
        pos = np.nonzero(np.asarray(valid))[0]
        if len(pos) == 0:
            return (
                np.zeros((0, packed_length(self.output_size)), np.uint8),
                np.zeros((0,), np.int64),
            )
        indices = indices[pos]
        matrices = np.asarray(matrices, np.float32)[pos]
        out = warp_yuv420_batch_native(
            rows,
            src_hw,
            matrices,
            indices.astype(np.int32),
            self.output_size,
            self.padding,
            n_threads=max(1, (os.cpu_count() or 1) // max(1, self.num_processes)),
        )
        if out is None:  # pragma: no cover - gated by _host_yuv_rows_ok
            return None
        return out, indices

    def _jpeg_bound(self, file_names) -> bool:
        """Whether every output of this batch will be a JPEG file.

        True when ``output_format`` forces jpg/jpeg, or (with the format
        inherited per source) every file name in the batch is a JPEG.
        Gates the packed-output paths: 4:2:0 packing is the JPEG encoder's
        own lossy front half, so it is only exact-enough for JPEG targets.
        """
        if self.output_format is not None:
            return self.output_format.lower() in ("jpg", "jpeg")
        return all(str(n).lower().endswith((".jpg", ".jpeg")) for n in file_names)

    def _crop_file_name(self, source_name: str, occurrence: int) -> str:
        """Output file name for the ``occurrence``-th face of a source image.

        ``output_format`` overrides the extension; with ``strategy="all"``
        (several crops may share a source) a ``_<occurrence>`` suffix keeps
        names unique — both per reference cropper.py:554-609.
        """
        stem, ext = os.path.splitext(source_name)
        if self.output_format is not None:
            ext = "." + self.output_format
        if self.strategy == "all":
            stem = f"{stem}_{occurrence}"
        return stem + ext

    def save_group(
        self,
        faces: np.ndarray,
        file_names: list[str] | np.ndarray,
        output_dir: str,
    ):
        """Writes one group of faces (or masks) into one directory.

        Output naming comes from :meth:`_crop_file_name`; an empty group
        creates no directory (reference cropper.py:554-609 semantics).
        """
        if len(faces) == 0:
            return
        os.makedirs(output_dir, exist_ok=True)
        seen: defaultdict[str, int] = defaultdict(int)
        writes = []
        for face, source in zip(faces, file_names):
            writes.append((seen[source], source, face))
            seen[source] += 1
        if self.strategy == "all":
            # Occurrence 0 is written LAST (stable partition): its existence
            # is the resume marker (``process_dir(skip_existing=True)``
            # checks occurrence 0 only), so it must imply the source's other
            # ``_N``-suffixed faces already landed — otherwise a kill between
            # face _0 and face _1 would silently lose _1+ on every resume.
            # Only under strategy="all": other strategies give repeated
            # occurrences (duplicate landmark rows for one file) the SAME
            # name, where the reference's sequential writes make the last
            # row win — reordering would flip that overwrite winner.
            writes = [w for w in writes if w[0] != 0] + [
                w for w in writes if w[0] == 0
            ]
        from .utils.io import PackedYUVImage

        for occurrence, source, face in writes:
            out_name = self._crop_file_name(source, occurrence)
            if isinstance(face, PackedYUVImage):
                # Packed-4:2:0 source (or packed enhancer output) in the
                # pure no-crop modes.  JPEG targets take the raw-data
                # encoder — for pass-through sources that writes the
                # *stored* samples back (no decode/re-encode generation
                # loss); other targets reconstruct RGB on host.
                from .utils.io import imwrite_yuv420

                if out_name.lower().endswith((".jpg", ".jpeg")) and imwrite_yuv420(
                    os.path.join(output_dir, out_name),
                    face.packed,
                    (face.w, face.h),
                ):
                    continue
                face = face.to_rgb()
            face = np.asarray(face)
            if face.ndim == 1:
                # Device-packed YCbCr 4:2:0 row (see _packed_fetch_eligible):
                # straight to the native raw-data JPEG encoder.
                from .utils.io import imwrite_yuv420

                imwrite_yuv420(
                    os.path.join(output_dir, out_name), face, self.output_size
                )
            else:
                imwrite(os.path.join(output_dir, out_name), face)

    def save_groups(
        self,
        faces: np.ndarray,
        file_names: np.ndarray,
        output_dir: str,
        attr_groups: dict[str, list[int]] | None,
        mask_groups: dict[str, tuple[list[int], np.ndarray]] | None,
    ):
        """Saves faces (and masks) into the attr × mask directory tree.

        Directory layout parity with reference cropper.py:611-746:

        * no grouping → everything directly in ``output_dir``;
        * attribute groups → one sub-directory per attribute;
        * mask groups → one sub-directory per mask name plus a
          ``<name>_mask`` sibling holding the binary masks;
        * both active → ``output_dir/<attr>/<mask>[_mask]/...`` with cell
          membership the intersection of the two groups.
        """
        n = len(faces)
        # Normalize both groupings to the same shape: name → (member face
        # indices, masks-or-None); a single unnamed group means "no filter".
        attr_cells = {"": list(range(n))} if attr_groups is None else attr_groups
        mask_cells = (
            {"": (list(range(n)), None)} if mask_groups is None else mask_groups
        )

        for attr_name, attr_members in attr_cells.items():
            attr_set = set(attr_members)
            for mask_name, (mask_members, masks) in mask_cells.items():
                # Cell membership in ascending face order; ``pos`` remembers
                # each member's row in the mask group's stacked mask array.
                cell = sorted(
                    (face_i, pos)
                    for pos, face_i in enumerate(mask_members)
                    if face_i in attr_set
                )
                if not cell:
                    continue
                members = [face_i for face_i, _ in cell]
                names = [file_names[i] for i in members]
                cell_dir = os.path.join(output_dir, attr_name, mask_name)
                self.save_group([faces[i] for i in members], names, cell_dir)
                if masks is not None:
                    rows = [pos for _, pos in cell]
                    self.save_group(masks[rows], names, cell_dir + "_mask")

    # ------------------------------------------------------------------
    # Per-batch pipeline
    # ------------------------------------------------------------------

    def _detect_interim(self, images: list[np.ndarray]):
        """Detects faces on the host-resized interim batch.

        The shared detect block of every staged path: ``as_batch`` to the
        interim size, pad the batch to ``batch_size`` (one compiled detector
        program for any request size), drop faces found on padding rows, and
        un-pad landmark coordinates.

        Returns:
            Tuple of the interim batch (N, H, W, 3), its paddings (N, 4),
            float32 landmarks (F, 5, 2) in un-padded interim coordinates,
            and the face→image index list (F,).
        """
        batch, _, paddings = as_batch(images, self.resize_size)
        n_true = len(batch)
        det_in = batch
        if n_true < self.batch_size:
            from .utils.batching import pad_batch_to

            det_in, _ = pad_batch_to(batch, self.batch_size)
        landmarks, indices = self.det_model.predict(det_in)
        keep = [j for j, i in enumerate(indices) if i < n_true]
        landmarks = landmarks[keep] if len(landmarks) else landmarks
        indices = [indices[j] for j in keep]
        if len(landmarks) > 0:
            landmarks = landmarks - paddings[indices][:, None, [2, 0]]
        return batch, paddings, landmarks, indices

    def _detect_crop_staged(self, images: list[np.ndarray]):
        """Classic staged detect→align→crop for a ragged image list.

        Host-resizes to the interim size (one compiled detector program for
        any mix of shapes), detects, un-pads landmarks, estimates transforms
        (dropping degenerate fits together with their indices) and warps.

        Returns:
            Tuple of uint8 crops (F, Ho, Wo, 3) and int64 local image
            indices (F,).
        """
        empty = (np.zeros((0,) + self.output_size[::-1] + (3,), np.uint8),
                 np.zeros((0,), np.int64))
        with self.stats.stage("detect", len(images)):
            batch, paddings, landmarks, indices = self._detect_interim(images)
            if len(landmarks) == 0:
                return empty
            indices = np.asarray(indices, np.int64)

        if self.enh_model is not None:
            # Same gate+SR step the generic detection path applies: images
            # that fall back to this staged path (odd shapes in a fused run)
            # must still be enhanced — reference cropper.py:837-840 always
            # enhances gated images in detection mode.
            with self.stats.stage("enhance", len(batch)):
                batch = self.enh_model.predict(batch, landmarks, list(indices))

        with self.stats.stage("crop", len(landmarks)):
            return self._align_crop_filtered(batch, paddings, indices, landmarks)

    def process_batch(
        self, file_names: list[str], input_dir: str, output_dir: str
    ):
        """Runs the full 6-stage pipeline for one batch of files.

        Stage structure mirrors reference cropper.py:748-850 (read →
        landmarks → enhance → align/crop → parse → save) with the three
        landmark modes: no-op (neither landmarks nor detector), precomputed
        landmark lookup, or on-device detection.
        """
        # In detection mode, oversized JPEGs may be decoded at reduced DCT
        # scale (never below the detector's working resolution).  With
        # precomputed landmarks the coordinates are in full-resolution space,
        # so sources must decode at native size.
        target_max = (
            max(self.resize_size)
            if (self.landmarks is None and self.det_model is not None)
            else None
        )
        want_packed = self._packed_upload_eligible()
        yuv_crop = self._yuv_crop_eligible()
        with self.stats.stage("read", len(file_names)):
            images, file_names = read_images(
                file_names,
                input_dir,
                target_max,
                want_packed=want_packed or yuv_crop,
            )
        if len(images) == 0:
            return
        paddings = None

        if self._fused is not None:
            # Hot path: group images by decoded shape; shapes in the bounded
            # fused-shape set run the single-dispatch device program
            # (sampling crops from original-resolution pixels), the rest go
            # through the staged path with host resizing.  Each program is
            # compiled once per (shape, batch_size) thanks to batch padding.
            # Packed 4:2:0 sources group under a distinct key (they upload
            # as (N, L) rows and reconstruct on device).
            by_shape: dict[tuple, list[int]] = defaultdict(list)
            for i, im in enumerate(images):
                by_shape[getattr(im, "group_key", im.shape)].append(i)

            fused_groups = []
            classic_ids: list[int] = []
            for shape, ids in by_shape.items():
                if self._fused_eligible(shape, len(ids)):
                    fused_groups.append(ids)
                else:
                    classic_ids.extend(ids)

            if fused_groups:
                crops_parts, idx_parts = [], []
                from .utils.batching import pad_batch_to

                # Pure single-group fused batches hand crops to the parser
                # as a device array (no host→device re-upload).
                device_handoff = (
                    self.par_model is not None
                    and self.mesh is None
                    and len(fused_groups) == 1
                    and not classic_ids
                )
                dev_crops = None
                # Host-crop execution mode: the device runs detect-only and
                # the host warps from the already-decoded sources — the
                # device warp's gather is slower than the whole detector
                # (see _host_crop_enabled).  Needs no device-side crop
                # consumer; packed 4:2:0 sources compose (the host warps
                # the numpy-twin reconstruction of the same stored planes
                # the device detects on).
                host_crop = (
                    self.enh_model is None
                    and not device_handoff
                    and self._host_crop_enabled()
                )
                # JPEG-bound crops come down as device-packed 4:2:0 rows
                # (half the fetch bytes); with a parser active this needs
                # the device handoff (the parser reads the RGB device
                # array, so only the save copy crosses the link packed).
                # Host crops never cross the link, so nothing to pack.
                pack = not host_crop and self._packed_fetch_eligible(
                    file_names, parser_handoff=device_handoff
                )
                # Host-crop + packed sources: warp crops straight from the
                # stored 4:2:0 planes (r5 YUV-direct, _yuv_crop_eligible's
                # detection-mode twin) — the full-size RGB reconstruction
                # the r4 host-crop path paid per batch disappears, the warp
                # moves half the bytes, and saves skip the encoder's color
                # convert + downsample.  RGB groups/leftovers in the same
                # batch convert via the numpy twin like the pack path.
                host_pack = (
                    host_crop
                    and self.par_model is None
                    and self._host_yuv_rows_ok(file_names)
                )

                from .utils.io import PackedYUVImage, unpack_images

                for ids in fused_groups:
                    first = images[ids[0]]
                    packed_hw = None
                    if isinstance(first, PackedYUVImage):
                        batch = np.stack([images[i].packed for i in ids])
                        packed_hw = (first.h, first.w)
                    else:
                        batch = np.stack([images[i] for i in ids])
                    n_true = len(batch)
                    if n_true < self.batch_size:
                        batch, _ = pad_batch_to(batch, self.batch_size)
                    with self.stats.stage("detect+crop", n_true):
                        if host_crop:
                            lm, loc = self._fused.detect_only(
                                batch, self.resize_size, valid_n=n_true,
                                packed_hw=packed_hw,
                            )
                            if len(lm):
                                crops = None
                                if packed_hw is not None and host_pack:
                                    # YUV-direct: warp crops straight from
                                    # the stored planes — no full-size RGB
                                    # reconstruction, packed rows to save.
                                    res = self._align_crop_yuv_rows(
                                        batch[:n_true], packed_hw, loc, lm
                                    )
                                    if res is not None:
                                        crops, loc = res
                                if crops is None:
                                    if packed_hw is not None:
                                        # Warp sources: the bit-identical
                                        # twin of the on-device RGB
                                        # reconstruction (threaded C++,
                                        # numpy fallback).
                                        from .ops.yuv import yuv420_to_rgb_np
                                        from .utils.native_io import (
                                            yuv420_to_rgb_native,
                                        )

                                        src = yuv420_to_rgb_native(
                                            batch[:n_true], *packed_hw
                                        )
                                        if src is None:
                                            src = yuv420_to_rgb_np(
                                                batch[:n_true], *packed_hw
                                            )
                                    else:
                                        src = batch[:n_true]
                                    crops, loc = self._align_crop_filtered(
                                        src, None, loc, lm, prefer_native=True
                                    )
                                    if host_pack and len(crops):
                                        # RGB-source groups join the packed
                                        # rows via the numpy twin (same
                                        # move as the pack path's
                                        # leftovers).
                                        from .ops.yuv import rgb_to_yuv420_np

                                        crops = rgb_to_yuv420_np(crops)
                            else:
                                crops = lm.reshape(0, 1, 1, 3)
                        else:
                            result = self._fused.process(
                                batch,
                                self.resize_size,
                                return_device_crops=device_handoff,
                                valid_n=n_true,
                                pack_crops=pack,
                                packed_hw=packed_hw,
                            )
                            crops, _lm, loc = result[:3]
                            if device_handoff:
                                dev_crops = result[3]
                    if len(crops):
                        crops_parts.append(crops)
                        idx_parts.append(np.asarray(ids)[loc])

                if classic_ids:
                    sub = unpack_images([images[i] for i in classic_ids])
                    crops2, loc2 = self._detect_crop_staged(sub)
                    if len(crops2):
                        if pack or host_pack:
                            # Host-resident leftovers join the packed rows
                            # via the bit-identical numpy twin.
                            from .ops.yuv import rgb_to_yuv420_np

                            crops2 = rgb_to_yuv420_np(crops2)
                        crops_parts.append(crops2)
                        idx_parts.append(np.asarray(classic_ids)[loc2])

                if not crops_parts:
                    return
                crops = np.concatenate(crops_parts)
                indices = np.concatenate(idx_parts)

                groups = (None, None)
                if self.par_model is not None:
                    with self.stats.stage("parse", len(crops)):
                        if dev_crops is not None:
                            groups = self.par_model.predict(
                                dev_crops, valid_n=len(crops)
                            )
                        else:
                            host_in = crops
                            if pack:
                                # The device handle fell through (degenerate
                                # transform / >max_warp_chunk faces): the
                                # parser reads the host reconstruction of
                                # the packed rows — bounded by the same
                                # 4:2:0 loss the saved JPEGs carry.
                                from .ops.yuv import yuv420_to_rgb_np

                                w, h = self.output_size
                                host_in = yuv420_to_rgb_np(crops, h, w)
                            groups = self.par_model.predict(host_in)
                file_names = np.asarray(file_names)
                with self.stats.stage("save", len(crops)):
                    self.save_groups(
                        crops, file_names[indices], output_dir, *groups
                    )
                return

        pure_no_crop = self.landmarks is None and self.det_model is None
        if want_packed and not pure_no_crop:
            # No fused group formed (odd shapes / tiny batch): the staged
            # detect/landmark paths below need RGB arrays.  The pure
            # no-crop modes keep packed sources: the enhancer/parser
            # reconstruct on device and saves go straight to the raw-data
            # JPEG encoder.
            from .utils.io import unpack_images

            images = unpack_images(images)

        if pure_no_crop:
            indices, landmarks = list(range(len(file_names))), None
        elif self.landmarks is not None:
            indices, indices_ldm = [], []
            for i, file_name in enumerate(file_names):
                matches = np.where(file_name == self.landmarks[1])[0]
                if len(matches) == 0:
                    continue
                indices.extend([i] * len(matches))
                indices_ldm.extend(matches.tolist())
            landmarks = self.landmarks[0][indices_ldm]
        else:
            with self.stats.stage("detect", len(images)):
                batch, paddings, landmarks, indices = self._detect_interim(images)
                images = batch

        if landmarks is not None and len(landmarks) == 0:
            return

        if landmarks is not None and landmarks.shape[1] != self.num_std_landmarks:
            landmarks = reduce_landmarks(landmarks, self.num_std_landmarks)

        if self.enh_model is not None:
            # In the pure no-crop mode with JPEG-bound saves, enhanced
            # images come back as packed 4:2:0 rows (the JPEG encoder's
            # lossy front half, computed on device — half the fetch bytes;
            # save_group feeds them straight to the raw-data encoder).
            pack_out = (
                want_packed
                and pure_no_crop
                and isinstance(images, list)
                and self._jpeg_bound(file_names)
            )
            with self.stats.stage("enhance", len(images)):
                images = self.enh_model.predict(
                    images, landmarks, indices, pack_out=pack_out
                )

        groups = (None, None)

        if landmarks is not None:
            with self.stats.stage("crop", len(landmarks)):
                if yuv_crop:
                    # JPEG-in/JPEG-out landmark crops stay in packed
                    # 4:2:0 space end to end (see _yuv_crop_eligible).
                    images, indices = self._align_crop_yuv(
                        images, indices, landmarks
                    )
                else:
                    images, indices = self._align_crop_filtered(
                        images, paddings, indices, landmarks
                    )
            if len(images) == 0:
                return

        if self.par_model is not None:
            parse_in, src_hw = images, None
            if isinstance(images, list):
                if len({im.shape for im in images}) > 1:
                    # Same constraint as the reference (README.md:243): the
                    # no-crop parse path batches the originals.
                    raise ValueError(
                        "Parsing without cropping requires all images to "
                        "share dimensions; resize them or enable cropping "
                        "(set det_threshold or provide landmarks)."
                    )
                from .utils.io import PackedYUVImage, unpack_images

                if all(isinstance(im, PackedYUVImage) for im in images):
                    # Packed sources (or packed enhancer output) upload as
                    # (N, L) rows; the parser reconstructs on device.
                    parse_in = np.stack([im.packed for im in images])
                    src_hw = images[0].shape[:2]
                else:
                    # A mix of packed and RGB entries of the same dims
                    # (e.g. some sources were not plain 4:2:0): parse the
                    # host reconstructions so one program serves the batch.
                    images = np.stack(unpack_images(images))
                    parse_in = images
            with self.stats.stage("parse", len(parse_in)):
                groups = self.par_model.predict(parse_in, src_hw=src_hw)

        file_names = np.asarray(file_names)
        if not isinstance(images, list):
            images = np.asarray(images)
        # note: `images` may be a ragged list in the no-crop modes;
        # save_groups indexes per item, so a list passes through unchanged.
        with self.stats.stage("save", len(images)):
            self.save_groups(images, file_names[indices], output_dir, *groups)

    def process_images(
        self, images: list[np.ndarray] | np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, tuple]:
        """In-memory serving API: images → (crops, indices, groups).

        Runs detect (or landmark-free pass-through) → optional enhancement →
        align/crop → optional parsing, without touching the filesystem —
        the building block for serving deployments (the reference only
        offers the directory pipeline).

        Args:
            images: Uniform (N, H, W, 3) uint8 batch or list of RGB arrays.

        Returns:
            Tuple of uint8 crops (F, Ho, Wo, 3), int64 face→image indices
            (F,), and the (attr_groups, mask_groups) pair (None elements
            when grouping is not configured).
        """
        if isinstance(images, np.ndarray):
            images = list(images)
        if self.det_model is None:
            raise ValueError(
                "process_images requires an active detector "
                "(det_threshold must be set and landmarks must be None)."
            )
        if len(images) == 0:
            return (
                np.zeros((0,) + self.output_size[::-1] + (3,), np.uint8),
                np.zeros((0,), np.int64),
                (None, None),
            )

        uniform = len({im.shape for im in images}) == 1
        if (
            self._fused is not None
            and uniform
            and self._fused_eligible(images[0].shape, len(images))
        ):
            batch = np.stack(images)
            n_true = len(batch)
            if n_true < self.batch_size:
                from .utils.batching import pad_batch_to

                batch, _ = pad_batch_to(batch, self.batch_size)
            if self.enh_model is None and self._host_crop_enabled():
                # Host-crop execution mode (see _host_crop_enabled): the
                # serving API has the host sources in hand too.
                lm, loc = self._fused.detect_only(
                    batch, self.resize_size, valid_n=n_true
                )
                if len(lm):
                    crops, indices = self._align_crop_filtered(
                        batch[:n_true], None, loc, lm, prefer_native=True
                    )
                else:
                    crops = np.zeros(
                        (0,) + self.output_size[::-1] + (3,), np.uint8
                    )
                    indices = np.zeros((0,), np.int64)
            else:
                crops, _lm, indices = self._fused.process(
                    batch, self.resize_size, valid_n=n_true
                )
        else:
            # Staged detect → (gated enhance) → crop; one compiled detector
            # program for any mix of shapes (requests padded to batch_size).
            crops, indices = self._detect_crop_staged(images)

        groups = (None, None)
        if self.par_model is not None and len(crops):
            groups = self.par_model.predict(crops)
        return crops, indices, groups

    def process_images_stream(
        self, batches, depth: int = 2, pack_upload: bool | None = None
    ):
        """Pipelined serving: an iterable of request batches in, one
        ``(crops, indices, groups)`` tuple out per batch, in order.

        JAX dispatch is asynchronous but :meth:`process_images` must fetch
        its own outputs before returning, so back-to-back calls serialize
        the link upload, device execution and fetch — on a tunneled chip
        each call pays the full round trip.  This generator keeps up to
        ``depth`` request batches in flight on the device: batch k+1's
        upload and detect dispatch are enqueued before batch k's results
        are fetched, so steady-state throughput approaches
        ``max(link, device, host-warp)`` instead of their sum.

        Pipelining engages for the host-crop detect-only configuration
        (no enhancement — see :meth:`_host_crop_enabled`) on uniform-shape
        batches; any other configuration or batch degrades to a serialized
        :meth:`process_images` call for that batch after draining the
        in-flight queue, so results stay correct and ordered.  Parsing,
        when configured, runs at collect time per batch.

        Args:
            batches: Iterable of uniform (N, H, W, 3) uint8 batches or
                lists of RGB arrays (a request stream).
            depth: Maximum batches in flight (2 covers dispatch/fetch
                overlap; more helps only when per-batch host work varies).
            pack_upload: Send detect inputs as packed YCbCr 4:2:0 rows
                (1.5 B/px — halves upload bytes on a link-bound serving
                deployment).  Crops still warp from the caller's RGB
                pixels on the host, so crop fidelity is unchanged;
                *detection* sees the 4:2:0 round trip of its input
                (~1 intensity level — the same loss the directory
                pipeline's packed JPEG path accepts by construction,
                except here the sources were not already 4:2:0).
                Default ``None`` reads ``FCPT_SERVE_PACK`` ("1" on,
                anything else off); needs even batch H and W.

        Yields:
            The :meth:`process_images` result tuple for each input batch.
        """
        from collections import deque

        if self.det_model is None:
            raise ValueError(
                "process_images_stream requires an active detector "
                "(det_threshold must be set and landmarks must be None)."
            )
        depth = max(1, int(depth))
        if pack_upload is None:
            pack_upload = os.environ.get("FCPT_SERVE_PACK") == "1"
        queue: deque = deque()

        def collect(item):
            batch, n_true, handle = item
            lm, loc = self._fused.detect_only_finish(handle)
            if len(lm):
                crops, indices = self._align_crop_filtered(
                    batch[:n_true], None, loc, lm, prefer_native=True
                )
            else:
                crops = np.zeros(
                    (0,) + self.output_size[::-1] + (3,), np.uint8
                )
                indices = np.zeros((0,), np.int64)
            groups = (None, None)
            if self.par_model is not None and len(crops):
                groups = self.par_model.predict(crops)
            return crops, indices, groups

        for images in batches:
            if isinstance(images, np.ndarray):
                images = list(images)
            uniform = (
                len(images) > 0 and len({im.shape for im in images}) == 1
            )
            can_stream = (
                uniform
                and self._fused is not None
                and self.enh_model is None
                and self._host_crop_enabled()
                and self._fused_eligible(images[0].shape, len(images))
            )
            if not can_stream:
                while queue:
                    yield collect(queue.popleft())
                yield self.process_images(images)
                continue
            batch = np.stack(images)
            n_true = len(batch)
            if n_true < self.batch_size:
                from .utils.batching import pad_batch_to

                batch, _ = pad_batch_to(batch, self.batch_size)
            h, w = batch.shape[1], batch.shape[2]
            if pack_upload and h % 2 == 0 and w % 2 == 0:
                from .ops.yuv import rgb_to_yuv420_np

                handle = self._fused.detect_only_async(
                    rgb_to_yuv420_np(batch), self.resize_size,
                    valid_n=n_true, packed_hw=(h, w),
                )
            else:
                handle = self._fused.detect_only_async(
                    batch, self.resize_size, valid_n=n_true
                )
            queue.append((batch, n_true, handle))
            while len(queue) > depth:
                yield collect(queue.popleft())
        while queue:
            yield collect(queue.popleft())

    def process_dir(
        self,
        input_dir: str,
        output_dir: str | None = None,
        desc: str | None = "Processing",
        shard_index: int | None = None,
        num_shards: int | None = None,
        skip_existing: bool = False,
    ):
        """Processes a whole directory in file batches.

        Batches are mapped over a thread pool (``num_processes`` workers):
        device compute naturally serializes on the accelerator while host
        decode/encode of neighboring batches overlaps with it — the same
        concurrency model as the reference (cropper.py:900-909) minus the
        per-worker model re-initialization (JAX params are shared read-only).

        Multi-host scaling: the workload is embarrassingly parallel over
        files, so each host processes its own strided shard of the file
        list — pass ``shard_index=jax.process_index()`` and
        ``num_shards=jax.process_count()`` (outputs are distinct files, no
        coordination needed).

        ``skip_existing`` is a cheap resume for interrupted large-dataset
        runs (the reference has none — re-running re-processes everything):
        a source file is skipped when the top-level output directory already
        holds a crop named after it (the plain name, or the first ``_0``
        occurrence under ``strategy="all"``).  Sources that previously
        produced *no* output (no face found, unreadable) are re-processed;
        grouped attr/mask subtrees are not consulted.  Individual files are
        written atomically (temp + rename), so a crash never leaves a
        truncated crop that would be frozen by a resume; under
        ``strategy="all"`` :meth:`save_group` writes each source's
        occurrence 0 *last*, so the marker's existence implies the
        source's other faces already landed — a kill between two faces of
        the same source re-processes that source instead of losing them.
        """
        if output_dir is None:
            output_dir = input_dir + "_faces"

        files, bs = sorted(os.listdir(input_dir)), self.batch_size
        if num_shards is not None and num_shards > 1:
            files = files[(shard_index or 0) :: num_shards]
        if skip_existing and os.path.isdir(output_dir):
            # Filter AFTER the strided shard split: each host prunes its own
            # shard, so a host starting later (when more outputs exist) still
            # covers exactly the same source partition — filtering first
            # would skew the stride and could orphan files between hosts.
            done = set(os.listdir(output_dir))
            files = [
                f for f in files if self._crop_file_name(f, 0) not in done
            ]
        file_batches = [files[i : i + bs] for i in range(0, len(files), bs)]
        if len(file_batches) == 0:
            return

        worker = partial(
            self.process_batch, input_dir=input_dir, output_dir=output_dir
        )

        if self.num_processes <= 1:
            iterator = map(worker, file_batches)
            iterator = self._progress(iterator, len(file_batches), desc)
            for _ in iterator:
                pass
            return

        with ThreadPool(self.num_processes) as pool:
            imap = pool.imap_unordered(worker, file_batches)
            for _ in self._progress(imap, len(file_batches), desc):
                pass

    @staticmethod
    def _progress(iterator, total, desc):
        if desc is None:
            return iterator
        try:
            import tqdm

            return tqdm.tqdm(iterator, total=total, desc=desc)
        except Exception:  # pragma: no cover
            return iterator
