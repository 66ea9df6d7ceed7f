"""RetinaFace face detector + 5-point landmark predictor (TPU-native).

Same capability as the reference detector
(``src/face_crop_plus/models/retinaface.py``): ResNet-50 → FPN → SSH → three
prediction heads (class/bbox/landmark over 2 anchors per cell at strides
8/16/32), anchor decode with variances (0.1, 0.2), visibility thresholding,
greedy NMS, and "all"/"best"/"largest" strategy selection.

TPU-first differences:

* One jitted program covers preprocessing → backbone → heads → decode → NMS
  → strategy selection; only the final padded landmark array + validity
  mask leave the device (the reference syncs per NMS iteration).
* Anchors are precomputed per input size and closed over as constants
  (the reference rebuilds them on the host every batch, retinaface.py:454).
* NHWC/bfloat16 backbone compute with float32 decode; all shapes static.
* Optional data-parallel sharding of the image batch over a mesh.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.anchors import anchor_grid
from ..ops.nms import select_faces
from ..ops.nn import (
    Params,
    batch_norm,
    conv2d,
    leaky_relu,
    resize_nearest,
    softmax,
)
from .backbones import resnet50_features
from .weights import load_or_init

#: Mean pixel offset in BGR order (detector preprocessing,
#: reference retinaface.py:450-451).
_BGR_MEAN = (104.0, 117.0, 123.0)

#: Box/landmark decode variances (reference retinaface.py:90).
_VARIANCES = (0.1, 0.2)

#: Hard ceiling for grow-on-demand pre-NMS candidates: NMS builds a (K, K)
#: IoU matrix per image, so memory grows quadratically; 1024 keeps it ~4 MB
#: per image while covering extreme crowd shots (the reference applies no
#: cap at all, retinaface.py:214-304, at the cost of a per-candidate Python
#: loop).
_PRE_TOPK_CEILING = 1024


# ---------------------------------------------------------------------------
# Network blocks (parameter names mirror the reference's module paths)
# ---------------------------------------------------------------------------


def _conv_bn(p, name, x, features, kernel, stride=1, padding=None, slope=0.0, act=True):
    x = conv2d(p, f"{name}.0", x, features, kernel=kernel, stride=stride, padding=padding)
    x = batch_norm(p, f"{name}.1", x)
    return leaky_relu(x, slope) if act else x


def _ssh(p: Params, name: str, x: jnp.ndarray, out_ch: int = 256) -> jnp.ndarray:
    """SSH context module: parallel 3x3 / 5x5 / 7x7 receptive-field branches."""
    quarter = out_ch // 4
    b3 = _conv_bn(p, f"{name}.conv3X3", x, out_ch // 2, 3, act=False)
    b5_1 = _conv_bn(p, f"{name}.conv5X5_1", x, quarter, 3)
    b5 = _conv_bn(p, f"{name}.conv5X5_2", b5_1, quarter, 3, act=False)
    b7_2 = _conv_bn(p, f"{name}.conv7X7_2", b5_1, quarter, 3)
    b7 = _conv_bn(p, f"{name}.conv7x7_3", b7_2, quarter, 3, act=False)
    return leaky_relu(jnp.concatenate([b3, b5, b7], axis=-1))


def _fpn(p: Params, feats, out_ch: int = 256):
    """3-level top-down FPN with nearest upsampling and 3x3 merge convs."""
    c3, c4, c5 = feats
    o1 = _conv_bn(p, "fpn.output1", c3, out_ch, 1, padding=0)
    o2 = _conv_bn(p, "fpn.output2", c4, out_ch, 1, padding=0)
    o3 = _conv_bn(p, "fpn.output3", c5, out_ch, 1, padding=0)

    o2 = o2 + resize_nearest(o3, (o2.shape[1], o2.shape[2]))
    o2 = _conv_bn(p, "fpn.merge2", o2, out_ch, 3)
    o1 = o1 + resize_nearest(o2, (o1.shape[1], o1.shape[2]))
    o1 = _conv_bn(p, "fpn.merge1", o1, out_ch, 3)
    return [o1, o2, o3]


def _head(p: Params, name: str, feats, num_out: int) -> jnp.ndarray:
    """Per-level 1x1 prediction heads → (N, sum(H*W*2), num_out).

    NHWC conv output reshapes directly to (N, H*W*anchors, num_out) with the
    same element order as the reference's permute+view (retinaface.py /
    _layers.py:147-162), which is what aligns predictions with the anchor
    grid layout.
    """
    outs = []
    for i, f in enumerate(feats):
        y = conv2d(p, f"{name}.{i}.conv1x1", f, 2 * num_out, kernel=1, padding=0, bias=True)
        outs.append(y.reshape(y.shape[0], -1, num_out))
    return jnp.concatenate(outs, axis=1)


def retinaface_forward(p: Params, x: jnp.ndarray):
    """Backbone+heads forward: (N,H,W,3) preproc input → (scores, loc, ldm).

    Returns softmaxed class scores (N, A, 2), box regressions (N, A, 4) and
    landmark regressions (N, A, 10).
    """
    feats = resnet50_features(p, "body", x)
    fpn = _fpn(p, feats)
    feats = [_ssh(p, f"ssh{i + 1}", f) for i, f in enumerate(fpn)]

    cls = _head(p, "ClassHead", feats, 2)
    loc = _head(p, "BboxHead", feats, 4)
    ldm = _head(p, "LandmarkHead", feats, 10)
    return softmax(cls, axis=-1), loc, ldm


def decode_detections(loc, ldm, priors, image_size, variances=_VARIANCES):
    """Undoes the training-time center-offset encoding (f32).

    Args:
        loc: (N, A, 4) box regressions.
        ldm: (N, A, 10) landmark regressions.
        priors: (A, 4) normalized anchor grid (cx, cy, w, h).
        image_size: (H, W) static ints for pixel scaling.
        variances: The (center, size) encoding variances (reference
            retinaface.py uses [0.1, 0.2]).

    Returns:
        Corner-form pixel boxes (N, A, 4) and pixel landmarks (N, A, 10).
    """
    h, w = image_size
    v0, v1 = variances
    loc = loc.astype(jnp.float32)
    ldm = ldm.astype(jnp.float32)
    cxy, pwh = priors[:, :2], priors[:, 2:]

    b_cxy = cxy + loc[..., :2] * v0 * pwh
    b_wh = pwh * jnp.exp(loc[..., 2:] * v1)
    xy1 = b_cxy - b_wh / 2.0
    xy2 = xy1 + b_wh
    boxes = jnp.concatenate([xy1, xy2], axis=-1)
    boxes = boxes * jnp.array([w, h, w, h], jnp.float32)

    pts = ldm.reshape(*ldm.shape[:-1], 5, 2)
    pts = cxy[:, None, :] + pts * v0 * pwh[:, None, :]
    pts = pts * jnp.array([w, h], jnp.float32)
    return boxes, pts.reshape(*ldm.shape[:-1], 10)


# ---------------------------------------------------------------------------
# Model wrapper
# ---------------------------------------------------------------------------


class RetinaFace:
    """Detector with the reference's prediction semantics, jitted end-to-end.

    Attributes mirror the reference (retinaface.py:86-90): ``strategy``,
    ``vis_threshold``, ``nms_threshold``, ``variance``.
    """

    #: Grow-on-demand ceiling for ``pre_topk`` (see
    #: :data:`_PRE_TOPK_CEILING`).  Raise per instance when exact parity
    #: with the uncapped reference matters more than the quadratic NMS
    #: memory (crowd scenes with >1024 above-threshold candidates).
    pre_topk_ceiling: int = _PRE_TOPK_CEILING

    def __init__(
        self,
        strategy: str = "all",
        vis: float = 0.6,
        max_faces: int = 64,
        pre_topk: int = 256,
        auto_grow: bool = True,
        weights_dir: str | None = None,
        device=None,
        mesh=None,
        compute_dtype=None,
    ):
        self.strategy = strategy
        self.vis_threshold = float(vis)
        self.nms_threshold = 0.4
        self.variance = list(_VARIANCES)
        self.max_faces = int(max_faces)
        self.pre_topk = int(pre_topk)
        #: Grow ``pre_topk``/``max_faces`` on demand when a batch overflows
        #: them (one recompile per grown cap; doubling keeps the program
        #: count logarithmic).  Off → a warning marks potential divergence
        #: from the uncapped reference semantics.
        self.auto_grow = bool(auto_grow)
        self._cap_warned = False
        self.device = device
        self.mesh = mesh

        platform = (
            mesh.devices.flat[0] if mesh is not None else (device or jax.devices()[0])
        ).platform
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
        self.compute_dtype = compute_dtype
        #: Pallas greedy-NMS kernel (VMEM-resident IoU); TPU only.
        self.use_pallas = platform == "tpu"

        data, self.pretrained = load_or_init(
            "retinaface", self._random_init, weights_dir
        )
        params = {k: jnp.asarray(v, jnp.float32) for k, v in data.items()}
        if mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
        elif device is not None:
            params = jax.device_put(params, device)
        self.params = params

    @staticmethod
    def _random_init() -> dict:
        from ..ops.nn import init_structure

        return init_structure(retinaface_forward, (1, 64, 64, 3), 0)

    @partial(
        jax.jit,
        static_argnames=(
            "self",
            "height",
            "width",
            "strategy",
            "vis_threshold",
            "nms_threshold",
            "max_faces",
            "pre_topk",
            "variances",
        ),
    )
    def _detect(
        self,
        params: dict,
        images: jnp.ndarray,
        height: int,
        width: int,
        strategy: str,
        vis_threshold: float,
        nms_threshold: float,
        max_faces: int,
        pre_topk: int,
        variances: tuple,
    ):
        """images uint8 (N, H, W, 3) RGB → padded (landms, valid).

        The documented-overridable knobs are explicit static arguments
        rather than attributes read off ``self`` at trace time: jax's jit
        fastpath keys static objects by identity, so a mutated attribute
        would silently hit the executable compiled with the old value.
        """
        p = Params(params)
        x = images.astype(jnp.float32)
        x = x[..., ::-1] - jnp.array(_BGR_MEAN, jnp.float32)  # RGB→BGR − mean
        x = x.astype(self.compute_dtype)

        scores2, loc, ldm = retinaface_forward(p, x)
        priors = jnp.asarray(anchor_grid(height, width))
        boxes, landms = decode_detections(
            loc, ldm, priors, (height, width), variances
        )
        scores = scores2[..., 1].astype(jnp.float32)

        return select_faces(
            scores,
            boxes,
            landms,
            vis_threshold=vis_threshold,
            nms_threshold=nms_threshold,
            pre_topk=pre_topk,
            max_faces=max_faces,
            strategy=strategy,
            use_pallas=self.use_pallas,
        )

    def _detect_args(self) -> dict:
        """Current values of the overridable knobs, as static jit kwargs."""
        return dict(
            strategy=self.strategy,
            vis_threshold=float(self.vis_threshold),
            nms_threshold=float(self.nms_threshold),
            max_faces=int(self.max_faces),
            pre_topk=int(self.pre_topk),
            variances=tuple(self.variance),
        )

    def __hash__(self):  # static jit arg (construction-time state only)
        return id(self)

    def __eq__(self, other):
        return self is other

    def grown_args(self, caps: np.ndarray, args: dict, n_anchors: int) -> dict | None:
        """Enlarged static detect args when a candidate/face cap bound.

        ``caps`` is the (N, 2) diagnostic from :func:`select_faces`
        (candidates above threshold, raw NMS keeps).  Caps grow to the next
        power of two that fits the observed demand — ``pre_topk`` bounded by
        the anchor count and :data:`_PRE_TOPK_CEILING`, ``max_faces`` (only
        meaningful for strategy "all") bounded by ``pre_topk``.  Returns
        None when nothing needs to (or can) grow; a cap that still binds at
        its ceiling warns once, since the uncapped reference
        (retinaface.py:214-304) could then produce different output.
        """
        if len(caps) == 0:
            return None
        n_above = int(caps[:, 0].max())
        kept_raw = int(caps[:, 1].max())
        new = dict(args)
        grew = False

        from ..utils.batching import next_pow2

        k = min(args["pre_topk"], n_anchors)
        k_ceiling = min(self.pre_topk_ceiling, n_anchors)
        if n_above > k:
            if self.auto_grow and k < k_ceiling:
                new["pre_topk"] = min(next_pow2(n_above, k), k_ceiling)
                grew = True
            else:
                self._warn_cap(
                    f"{n_above} candidates above the visibility threshold "
                    f"exceed pre_topk={k}"
                )

        if args["strategy"] == "all" and kept_raw > args["max_faces"]:
            f_ceiling = new["pre_topk"]
            if self.auto_grow and args["max_faces"] < f_ceiling:
                new["max_faces"] = min(
                    next_pow2(kept_raw, args["max_faces"]), f_ceiling
                )
                grew = True
            else:
                self._warn_cap(
                    f"{kept_raw} NMS-kept faces exceed max_faces="
                    f"{args['max_faces']}"
                )

        return new if grew else None

    def dispatch_with_growth(self, dispatch, n_anchors: int, valid_n: int):
        """Runs a detect dispatch under the cap-growth retry policy.

        ``dispatch(args)`` must return ``(out, caps)`` where ``caps`` is the
        (N, 2) diagnostic from :func:`select_faces`.  When a cap binds and
        ``auto_grow`` is on, the dispatch re-runs with doubled caps (new
        static shapes compile once) and the grown caps persist on the model
        so later batches skip the retry.  Shared by the staged path
        (:meth:`detect_padded`) and the fused pipeline so the growth policy
        cannot diverge between them.
        """
        args = self._detect_args()
        out, caps = dispatch(args)
        return self.finish_growth(out, caps, args, dispatch, n_anchors, valid_n)

    def finish_growth(self, out, caps, args, dispatch, n_anchors: int, valid_n: int):
        """Completes the growth policy for an already-dispatched detect call.

        The second half of :meth:`dispatch_with_growth`, split out so
        pipelined callers (``FusedPipeline.detect_only_async``) can issue
        the first dispatch without blocking on the ``caps`` fetch and
        resume the (rare) growth retries only when they collect results.
        """
        while True:
            grown = self.grown_args(np.asarray(caps)[:valid_n], args, n_anchors)
            if grown is None:
                return out
            args = grown
            self.pre_topk = args["pre_topk"]
            self.max_faces = args["max_faces"]
            out, caps = dispatch(args)

    def _warn_cap(self, detail: str):
        if self._cap_warned:
            return
        self._cap_warned = True
        import warnings

        warnings.warn(
            f"Detection cap binding: {detail}; output is truncated and may "
            "diverge from the uncapped reference semantics. Raise "
            "pre_topk/max_faces or enable auto_grow."
        )

    def detect_padded(self, images: np.ndarray):
        """Device-side detection returning padded arrays (no compaction).

        With a mesh, the image batch is sharded along the batch axis
        (padding to a mesh-size multiple at the host boundary) and params
        are replicated; XLA partitions the whole program data-parallel.

        When a batch overflows ``pre_topk``/``max_faces`` (crowd images)
        and ``auto_grow`` is on, detection re-dispatches with doubled caps —
        new static shapes compile once and are kept for the session; the
        grown caps persist on the model so later batches skip the retry.
        """
        h, w = images.shape[1], images.shape[2]
        if self.mesh is not None:
            from ..parallel.mesh import pad_to_multiple, shard_batch

            padded, valid_n = pad_to_multiple(np.asarray(images), self.mesh.size)
            imgs = shard_batch(padded, self.mesh)
        else:
            valid_n = len(images)
            imgs = jnp.asarray(images)
            if self.device is not None:
                imgs = jax.device_put(imgs, self.device)

        n_anchors = len(anchor_grid(h, w))

        def dispatch(args):
            landms, valid, caps = self._detect(self.params, imgs, h, w, **args)
            return (landms, valid), caps

        landms, valid = self.dispatch_with_growth(dispatch, n_anchors, valid_n)
        return np.asarray(landms)[:valid_n], np.asarray(valid)[:valid_n]

    def predict(self, images: np.ndarray) -> tuple[np.ndarray, list[int]]:
        """Predicts landmark sets for a uint8 RGB (N, H, W, 3) image batch.

        Returns:
            Tuple of a float32 (num_faces, 5, 2) landmark array and a list
            of source-image indices — the reference's predict contract
            (retinaface.py:410-470), produced here by compacting the padded
            device output once at the host boundary.
        """
        landms, valid = self.detect_padded(images)
        landms = np.asarray(landms)
        valid = np.asarray(valid)

        img_idx, face_idx = np.nonzero(valid)  # row-major: image order, then score order
        landmarks = landms[img_idx, face_idx].reshape(-1, 5, 2)
        return landmarks.astype(np.float32), img_idx.tolist()
