"""BiSeNet 19-class face parser with attribute/mask grouping (TPU-native).

Same capability as the reference parser (``src/face_crop_plus/models/
bise.py``): per-pixel classification of face crops into 19 attribute classes
(class table at bise.py:21-39), followed by grouping of whole faces into
attribute groups (pixel-count thresholds, AND-join, negative indices =
"must not contain") and mask groups (binary 0/255 masks).

TPU-first structure:

* One jitted program per face-batch bucket runs: /255 → bilinear resize to
  512² (as MXU matmuls) → ImageNet normalize → BiSeNet forward → 64²→512²
  align-corners bilinear upsample (matmul) → argmax → nearest resize back to
  crop size → per-face 19-bin label histogram.  Only the label map (uint8)
  and the (F, 19) counts leave the device; group membership is then decided
  on the host from the counts (tiny).
* Sub-batching (reference bise.py:391) becomes fixed-size bucket padding so
  XLA compiles a constant set of programs.
* NHWC, bfloat16 compute with f32 logits for the argmax.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.nn import (
    Params,
    batch_norm,
    conv2d,
    global_avg_pool,
    leaky_relu,
    max_pool,
    resize_bilinear,
    resize_nearest,
)
from ..utils.batching import pad_batch_to
from .weights import load_or_init

#: ImageNet channel statistics used at training time (bise.py:187-188).
_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)

NUM_CLASSES = 19
_INFER_SIZE = 512


# ---------------------------------------------------------------------------
# Network (parameter names mirror the reference's module paths)
# ---------------------------------------------------------------------------


def _conv_bn_relu(p, name, x, features, kernel=3, stride=1, padding=None):
    x = conv2d(p, f"{name}.conv", x, features, kernel, stride, padding)
    return leaky_relu(batch_norm(p, f"{name}.bn", x))


def _basic_block(p, name, x, features, stride):
    out = conv2d(p, f"{name}.conv1", x, features, 3, stride)
    out = leaky_relu(batch_norm(p, f"{name}.bn1", out))
    out = conv2d(p, f"{name}.conv2", out, features, 3)
    out = batch_norm(p, f"{name}.bn2", out)
    if stride != 1 or x.shape[-1] != features:
        sc = conv2d(p, f"{name}.downsample.0", x, features, 1, stride, padding=0)
        sc = batch_norm(p, f"{name}.downsample.1", sc)
    else:
        sc = x
    return leaky_relu(sc + out)


def _resnet18(p, prefix, x):
    """BiSeNet's custom ResNet-18 trunk returning stride 8/16/32 features."""
    x = conv2d(p, f"{prefix}.conv1", x, 64, 7, 2, padding=3)
    x = leaky_relu(batch_norm(p, f"{prefix}.bn1", x))
    x = max_pool(x, 3, 2, 1)
    for i in range(2):
        x = _basic_block(p, f"{prefix}.layer1.{i}", x, 64, 1)
    f8 = x
    for i in range(2):
        f8 = _basic_block(p, f"{prefix}.layer2.{i}", f8, 128, 2 if i == 0 else 1)
    f16 = f8
    for i in range(2):
        f16 = _basic_block(p, f"{prefix}.layer3.{i}", f16, 256, 2 if i == 0 else 1)
    f32 = f16
    for i in range(2):
        f32 = _basic_block(p, f"{prefix}.layer4.{i}", f32, 512, 2 if i == 0 else 1)
    return f8, f16, f32


def _arm(p, name, x, features):
    """Attention refinement: ConvBNReLU → global-pool sigmoid gate."""
    feat = _conv_bn_relu(p, f"{name}.conv", x, features)
    atten = global_avg_pool(feat)
    atten = conv2d(p, f"{name}.conv_atten", atten, features, 1, padding=0)
    atten = batch_norm(p, f"{name}.bn_atten", atten)
    return feat * jax.nn.sigmoid(atten.astype(jnp.float32)).astype(feat.dtype)


def _context_path(p, x):
    f8, f16, f32 = _resnet18(p, "cp.resnet", x)
    h16, w16 = f16.shape[1], f16.shape[2]
    h8, w8 = f8.shape[1], f8.shape[2]

    avg = global_avg_pool(f32)
    avg = _conv_bn_relu(p, "cp.conv_avg", avg, 128, kernel=1, padding=0)
    avg_up = jnp.broadcast_to(avg, (f32.shape[0], f32.shape[1], f32.shape[2], 128))

    f32_sum = _arm(p, "cp.arm32", f32, 128) + avg_up
    f32_up = resize_nearest(f32_sum, (h16, w16))
    f32_up = _conv_bn_relu(p, "cp.conv_head32", f32_up, 128)

    f16_sum = _arm(p, "cp.arm16", f16, 128) + f32_up
    f16_up = resize_nearest(f16_sum, (h8, w8))
    f16_up = _conv_bn_relu(p, "cp.conv_head16", f16_up, 128)
    return f8, f16_up


def _ffm(p, fsp, fcp):
    """Feature fusion: concat → 1x1 ConvBNReLU → squeeze-excite-style gate."""
    fcat = jnp.concatenate([fsp, fcp], axis=-1)
    feat = _conv_bn_relu(p, "ffm.convblk", fcat, 256, kernel=1, padding=0)
    atten = global_avg_pool(feat)
    atten = conv2d(p, "ffm.conv1", atten, 64, 1, padding=0)
    atten = leaky_relu(atten)
    atten = conv2d(p, "ffm.conv2", atten, 256, 1, padding=0)
    atten = jax.nn.sigmoid(atten.astype(jnp.float32)).astype(feat.dtype)
    return feat * atten + feat


def bisenet_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) normalized input → (N, H, W, 19) float32 logits.

    The final 8x upsample uses align_corners=True bilinear (bise.py:212),
    implemented as MXU matmuls.
    """
    f8, f16_up = _context_path(p, x)
    fused = _ffm(p, f8, f16_up)
    out = _conv_bn_relu(p, "conv_out.conv", fused, 256)
    out = conv2d(p, "conv_out.conv_out", out, NUM_CLASSES, 1, padding=0)
    out = resize_bilinear(
        out.astype(jnp.float32), (x.shape[1], x.shape[2]), align_corners=True
    )
    return out


# ---------------------------------------------------------------------------
# Model wrapper
# ---------------------------------------------------------------------------


class BiSeNet:
    """Face parser with grouping, matching the reference's predict contract.

    Attributes mirror reference bise.py:180-188 and are overridable after
    construction: ``attr_join_by_and``, ``attr_threshold``,
    ``mask_threshold``, ``mean``, ``std``.
    """

    def __init__(
        self,
        attr_groups: dict[str, list[int]] | None = None,
        mask_groups: dict[str, list[int]] | None = None,
        max_batch_size: int = 8,
        weights_dir: str | None = None,
        device=None,
        mesh=None,
        compute_dtype=None,
    ):
        self.attr_groups = attr_groups
        self.mask_groups = mask_groups
        self.batch_size = int(max_batch_size)
        self.attr_join_by_and = True
        self.attr_threshold = 5
        self.mask_threshold = 10
        self.mean = list(_MEAN)
        self.std = list(_STD)
        self.device = device
        self.mesh = mesh

        if compute_dtype is None:
            platform = (
                mesh.devices.flat[0] if mesh is not None else (device or jax.devices()[0])
            ).platform
            compute_dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
        self.compute_dtype = compute_dtype

        if mesh is not None:
            # Sub-batches must split evenly over the data axis.
            self.batch_size = -(-self.batch_size // mesh.size) * mesh.size

        data, self.pretrained = load_or_init("bisenet", self._random_init, weights_dir)
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

        return init_structure(bisenet_forward, (1, 64, 64, 3), 1)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    @partial(
        jax.jit, static_argnames=("self", "out_h", "out_w", "mean", "std", "src_hw")
    )
    def _parse(
        self,
        params: dict,
        images: jnp.ndarray,
        out_h: int,
        out_w: int,
        mean: tuple,
        std: tuple,
        src_hw: tuple | None = None,
    ):
        """uint8 (B, H, W, 3) crops → (labels (B,out_h,out_w) u8, counts (B,19)).

        ``mean``/``std`` are documented as overridable after construction,
        so they are explicit static arguments: jit's fastpath keys static
        objects by identity, and reading them off ``self`` at trace time
        would silently keep using the values from the first compile.

        With ``src_hw`` set, ``images`` is packed planar YCbCr 4:2:0 rows
        (B, L) from a packed source upload (1.5 bytes/pixel on the wire);
        the RGB reconstruction runs here, on device, as the first step.
        """
        p = Params(params)
        if src_hw is not None:
            from ..ops.yuv import yuv420_to_rgb

            images = yuv420_to_rgb(images, *src_hw)
        x = images.astype(jnp.float32) / 255.0
        x = resize_bilinear(x, (_INFER_SIZE, _INFER_SIZE))
        mean = jnp.array(mean, jnp.float32)
        std = jnp.array(std, jnp.float32)
        x = ((x - mean) / std).astype(self.compute_dtype)

        logits = bisenet_forward(p, x)  # (B, 512, 512, 19) f32
        labels = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        labels = resize_nearest(labels[..., None], (out_h, out_w))[..., 0]

        onehot = jax.nn.one_hot(labels, NUM_CLASSES, dtype=jnp.int32)
        counts = onehot.sum(axis=(1, 2))  # (B, 19)
        return labels, counts

    @partial(
        jax.jit,
        static_argnames=(
            "self", "out_h", "out_w", "mean", "std", "mask_attrs", "src_hw"
        ),
    )
    def _parse_packed(
        self,
        params: dict,
        images: jnp.ndarray,
        out_h: int,
        out_w: int,
        mean: tuple,
        std: tuple,
        mask_attrs: tuple,
        src_hw: tuple | None = None,
    ):
        """Like :meth:`_parse`, but emits *bit-packed* per-group masks.

        The label raster is 1 byte/pixel; what the host actually needs for
        mask groups is a binary mask per group, which packs to 1 bit/pixel
        — an 8x cut in device→host traffic (the dominant cost of the
        standalone parse path over PCIe, and ~70x over this dev tunnel).
        Bit order matches ``np.unpackbits`` (MSB first), so the host
        reconstructs masks with one vectorized call.

        Args:
            mask_attrs: Static tuple of per-group class-id tuples.

        Returns:
            uint8 packed masks (G, B, out_h, ceil(out_w/8)) and int32
            counts (B, 19).
        """
        labels, counts = self._parse(
            params, images, out_h, out_w, mean, std, src_hw
        )
        w8 = -(-out_w // 8)
        pad = w8 * 8 - out_w
        packed = []
        for attrs in mask_attrs:
            m = jnp.isin(labels, jnp.asarray(attrs, labels.dtype))
            m = jnp.pad(m, ((0, 0), (0, 0), (0, pad)))
            m = m.reshape(m.shape[0], out_h, w8, 8).astype(jnp.uint8)
            # MSB-first bit packing (np.unpackbits order), pure VPU shifts.
            bits = sum(m[..., k] << (7 - k) for k in range(8))
            packed.append(bits.astype(jnp.uint8))
        return jnp.stack(packed), counts

    def _sub_batches(self, images):
        """Yields (device sub-batch, start, valid) at ``batch_size`` chunks.

        ``images`` may be a host uint8 array or a *device* array (crops
        handed over from the fused pipeline, skipping the re-upload); mesh
        runs re-place each sub-batch with the data-parallel sharding
        (batch_size was rounded to a mesh multiple in ``__init__``).
        """
        on_device = isinstance(images, jnp.ndarray)
        bs = self.batch_size
        for start in range(0, images.shape[0], bs):
            chunk = images[start : start + bs]
            if on_device:
                valid = chunk.shape[0]
                if valid < bs:
                    reps = jnp.repeat(chunk[-1:], bs - valid, axis=0)
                    chunk = jnp.concatenate([chunk, reps], axis=0)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch

                    chunk = shard_batch(chunk, self.mesh)
                imgs = chunk
            else:
                padded, valid = pad_batch_to(chunk, bs)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch

                    imgs = shard_batch(padded, self.mesh)
                else:
                    imgs = jnp.asarray(padded)
                    if self.device is not None:
                        imgs = jax.device_put(imgs, self.device)
            yield imgs, start, valid

    def parse_batch(self, images, src_hw=None) -> tuple[np.ndarray, np.ndarray]:
        """Runs parsing for all faces in fixed-size sub-batches.

        ``src_hw`` marks ``images`` as packed YCbCr 4:2:0 rows (N, L) of
        that (h, w) — reconstructed on device inside the jitted program.
        Returns host arrays: uint8 labels (N, H, W) and int32 counts (N, 19).
        """
        n = images.shape[0]
        h, w = src_hw if src_hw is not None else images.shape[1:3]
        labels_out = np.empty((n, h, w), np.uint8)
        counts_out = np.empty((n, NUM_CLASSES), np.int32)
        for imgs, start, valid in self._sub_batches(images):
            labels, counts = self._parse(
                self.params,
                imgs,
                h,
                w,
                tuple(float(v) for v in self.mean),
                tuple(float(v) for v in self.std),
                src_hw,
            )
            labels_out[start : start + valid] = np.asarray(labels)[:valid]
            counts_out[start : start + valid] = np.asarray(counts)[:valid]
        return labels_out, counts_out

    def parse_counts(self, images, src_hw=None) -> np.ndarray:
        """Per-face class pixel counts only — nothing else leaves the device.

        The attribute-grouping path needs just the (N, 19) histogram; the
        label raster (1 byte/pixel) stays device-side.
        """
        n = images.shape[0]
        h, w = src_hw if src_hw is not None else images.shape[1:3]
        counts_out = np.empty((n, NUM_CLASSES), np.int32)
        for imgs, start, valid in self._sub_batches(images):
            _labels, counts = self._parse(
                self.params,
                imgs,
                h,
                w,
                tuple(float(v) for v in self.mean),
                tuple(float(v) for v in self.std),
                src_hw,
            )
            counts_out[start : start + valid] = np.asarray(counts)[:valid]
        return counts_out

    def parse_batch_packed(
        self, images, mask_attrs: tuple, src_hw=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Like :meth:`parse_batch`, fetching bit-packed per-group masks
        instead of the label raster (8x less device→host traffic).

        Returns host arrays: uint8 packed masks (G, N, H, ceil(W/8)) and
        int32 counts (N, 19).
        """
        n = images.shape[0]
        h, w = src_hw if src_hw is not None else images.shape[1:3]
        w8 = -(-w // 8)
        packed_out = np.empty((len(mask_attrs), n, h, w8), np.uint8)
        counts_out = np.empty((n, NUM_CLASSES), np.int32)
        for imgs, start, valid in self._sub_batches(images):
            packed, counts = self._parse_packed(
                self.params,
                imgs,
                h,
                w,
                tuple(float(v) for v in self.mean),
                tuple(float(v) for v in self.std),
                mask_attrs,
                src_hw,
            )
            packed_out[:, start : start + valid] = np.asarray(packed)[:, :valid]
            counts_out[start : start + valid] = np.asarray(counts)[:valid]
        return packed_out, counts_out

    # -- grouping (host, from device-computed counts/labels) ------------

    def group_by_attributes(self, counts: np.ndarray) -> dict[str, list[int]]:
        """Attribute-group membership from per-face class pixel counts.

        Positive index: count > attr_threshold must hold; negative index:
        count <= attr_threshold must hold; joined by AND (or OR when
        ``attr_join_by_and`` is False) — reference bise.py:214-267.
        """
        join = np.all if self.attr_join_by_and else np.any
        groups: dict[str, list[int]] = {}
        for name, attrs in self.attr_groups.items():
            conds = np.stack(
                [
                    counts[:, abs(a)] > self.attr_threshold
                    if a > 0
                    else counts[:, abs(a)] <= self.attr_threshold
                    for a in attrs
                ],
                axis=1,
            )
            member = join(conds, axis=1)
            groups[name] = np.nonzero(member)[0].tolist()
        return groups

    def group_by_masks(
        self, labels: np.ndarray, counts: np.ndarray
    ) -> dict[str, tuple[list[int], np.ndarray]]:
        """Mask-group membership + binary masks (reference bise.py:269-325)."""
        groups: dict[str, tuple[list[int], np.ndarray]] = {}
        for name, attrs in self.mask_groups.items():
            total = counts[:, attrs].sum(axis=1)
            inds = np.nonzero(total > self.mask_threshold)[0].tolist()
            masks = (
                np.isin(labels[inds], attrs).astype(np.uint8) * 255
                if inds
                else np.zeros((0,) + labels.shape[1:], np.uint8)
            )
            groups[name] = (inds, masks)
        return groups

    def group_by_masks_packed(
        self, packed: np.ndarray, counts: np.ndarray, width: int
    ) -> dict[str, tuple[list[int], np.ndarray]]:
        """:meth:`group_by_masks` from device-packed masks.

        Membership comes from ``counts`` exactly as in the raster path;
        only the member rows are unpacked (``np.unpackbits``, MSB-first —
        the device packing's bit order), so non-member faces cost nothing.
        """
        groups: dict[str, tuple[list[int], np.ndarray]] = {}
        h, w8 = packed.shape[2], packed.shape[3]
        for g, (name, attrs) in enumerate(self.mask_groups.items()):
            total = counts[:, attrs].sum(axis=1)
            inds = np.nonzero(total > self.mask_threshold)[0].tolist()
            if inds:
                bits = np.unpackbits(packed[g][inds], axis=-1)
                masks = bits.reshape(len(inds), h, w8 * 8)[:, :, :width] * 255
            else:
                masks = np.zeros((0, h, width), np.uint8)
            groups[name] = (inds, masks)
        return groups

    def predict(self, images, valid_n: int | None = None, src_hw=None):
        """Predicts attribute and mask groups for a uint8 face batch.

        Returns the reference's contract (bise.py:327-418): a tuple of
        ``attr_groups`` (name → face indices, empty groups dropped) and
        ``mask_groups`` (name → (face indices, stacked uint8 masks), empty
        groups dropped); either is None when not configured.

        Args:
            images: Host uint8 array, list of arrays, or a device array
                (parsed without a host round trip).
            valid_n: When the batch carries padding rows at the end (device
                handoff from the fused pipeline), only faces with index
                < ``valid_n`` are considered for groups.
            src_hw: When set, ``images`` is packed YCbCr 4:2:0 rows (N, L)
                of this (h, w) — uploaded at 1.5 bytes/pixel and
                reconstructed on device (packed source uploads in the pure
                parse mode).
        """
        if isinstance(images, list):
            images = np.stack(images)
        if not isinstance(images, jnp.ndarray):
            images = np.asarray(images, np.uint8)
        if src_hw is not None:
            src_hw = (int(src_hw[0]), int(src_hw[1]))

        # Only counts (tiny) and — when mask groups are configured —
        # bit-packed masks leave the device; the full label raster is never
        # fetched on this path.
        if self.mask_groups is not None:
            mask_attrs = tuple(
                tuple(int(a) for a in attrs) for attrs in self.mask_groups.values()
            )
            packed, counts = self.parse_batch_packed(images, mask_attrs, src_hw)
        else:
            packed, counts = None, self.parse_counts(images, src_hw)

        attr_groups = None
        if self.attr_groups is not None:
            attr_groups = self.group_by_attributes(counts)
            if valid_n is not None:
                attr_groups = {
                    k: [i for i in v if i < valid_n] for k, v in attr_groups.items()
                }
            attr_groups = {k: v for k, v in attr_groups.items() if len(v) > 0}

        mask_groups = None
        if self.mask_groups is not None:
            width = src_hw[1] if src_hw is not None else int(images.shape[2])
            mask_groups = self.group_by_masks_packed(packed, counts, width)
            if valid_n is not None:
                filtered = {}
                for k, (inds, masks) in mask_groups.items():
                    sel = [j for j, i in enumerate(inds) if i < valid_n]
                    filtered[k] = ([inds[j] for j in sel], masks[sel])
                mask_groups = filtered
            mask_groups = {k: v for k, v in mask_groups.items() if len(v[0]) > 0}

        return attr_groups, mask_groups
