"""RRDBNet (BSRGAN x4) gated super-resolution enhancer (TPU-native).

Same capability as the reference enhancer (``src/face_crop_plus/models/
rrdb.py``): a 23-block residual-in-residual dense network upscales images
4x, which are then bicubic-downscaled back to the original size (deblur
effect); only images whose mean face-area factor is at or below the
threshold are enhanced (rrdb.py:124-144).

TPU-first structure:

* The gate (mean face factor per image) is computed on the host from the
  already-available landmarks (a handful of flops), and only gated images
  are shipped through the jitted SR program — dynamic control flow stays at
  the host boundary, the device program is static.
* SR + bicubic x0.25 undo + clamp/round run as one fused jitted program per
  (batch, H, W) bucket.  The x0.25 undo is an exact 4-tap stride-4 filter
  (see :func:`face_crop_plus_tpu.ops.nn.downscale4x_bicubic`).
* bfloat16 trunk compute; only the tail runs at 4x, NHWC throughout.
* On TPU the trunk executes in **W-only space-to-depth, source-grouped**
  form (``trunk_mode="auto"`` → ``"ws2d"``): the plain trunk's 32/64-channel
  intermediates tile to the 128-lane HBM layout at 4x/2x read+write
  amplification, which is what its runtime is bound by (measured — see
  STATUS.md lever table); W-s2d doubles every channel count so activations
  pack exactly, and source-grouping turns the five narrow dense-block convs
  into five wide ones.  Exact (not approximate), 1.75x the plain trunk at
  512² on v5e.  ``trunk_mode="s2d"``/``use_s2d=True`` keeps the full
  transform available for study (see ``ops/s2d.py``).
* ``jax.checkpoint`` is unnecessary (inference-only), but sub-batching
  (default 1 image at a time, like the reference) bounds activation memory:
  at 1024² the 4x tail alone holds ~0.4 GB in bf16.
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.nn import Params, conv2d, downscale4x_bicubic, leaky_relu, upsample2x_nearest
from ..ops.s2d import (
    depth_to_space,
    depth_to_space_w,
    s2dw_bias,
    s2dw_conv_weight,
    space_to_depth,
    space_to_depth_w,
    transform_conv_params,
)
from .weights import load_or_init

_NF = 64  # trunk width
_GC = 32  # dense growth channels
_NUM_BLOCKS = 23
_SLOPE = 0.2


def _dense_block(p: Params, name: str, x: jnp.ndarray, m: int = 1) -> jnp.ndarray:
    """5-conv residual dense block with 0.2 residual scaling.

    ``m`` is the channel-width multiplier: 1 for the plain trunk, 4 when the
    block runs in space-to-depth form (s2d-transformed weights, same names).
    """
    x1 = leaky_relu(conv2d(p, f"{name}.conv1", x, _GC * m, bias=True), _SLOPE)
    c = jnp.concatenate([x, x1], axis=-1)
    x2 = leaky_relu(conv2d(p, f"{name}.conv2", c, _GC * m, bias=True), _SLOPE)
    c = jnp.concatenate([c, x2], axis=-1)
    x3 = leaky_relu(conv2d(p, f"{name}.conv3", c, _GC * m, bias=True), _SLOPE)
    c = jnp.concatenate([c, x3], axis=-1)
    x4 = leaky_relu(conv2d(p, f"{name}.conv4", c, _GC * m, bias=True), _SLOPE)
    c = jnp.concatenate([c, x4], axis=-1)
    x5 = conv2d(p, f"{name}.conv5", c, _NF * m, bias=True)
    return x5 * jnp.asarray(0.2, x.dtype) + x


def _rrdb(p: Params, name: str, x: jnp.ndarray, m: int = 1) -> jnp.ndarray:
    out = _dense_block(p, f"{name}.RDB1", x, m)
    out = _dense_block(p, f"{name}.RDB2", out, m)
    out = _dense_block(p, f"{name}.RDB3", out, m)
    return out * jnp.asarray(0.2, x.dtype) + x


def _tail(p: Params, fea: jnp.ndarray) -> jnp.ndarray:
    """Upsampling tail: x4 nearest-upsample conv stack (rrdb.py:64-81)."""
    fea = leaky_relu(conv2d(p, "upconv1", upsample2x_nearest(fea), _NF, bias=True), _SLOPE)
    fea = leaky_relu(conv2d(p, "upconv2", upsample2x_nearest(fea), _NF, bias=True), _SLOPE)
    fea = leaky_relu(conv2d(p, "HRconv", fea, _NF, bias=True), _SLOPE)
    return conv2d(p, "conv_last", fea, 3, bias=True)


def rrdbnet_forward(p: Params, x: jnp.ndarray, num_blocks: int = _NUM_BLOCKS) -> jnp.ndarray:
    """(N, H, W, 3) in [0, 1] → (N, 4H, 4W, 3) super-resolved output."""
    fea0 = conv2d(p, "conv_first", x, _NF, bias=True)
    t = fea0
    for i in range(num_blocks):
        t = _rrdb(p, f"RRDB_trunk.{i}", t)
    fea = fea0 + conv2d(p, "trunk_conv", t, _NF, bias=True)
    return _tail(p, fea)


def make_ws2d_grouped_trunk_params(params: dict, num_blocks: int) -> dict:
    """Host-side trunk-weight transform for the production TPU trunk.

    Two exact rewrites composed (measured on TPU v5e at 512², see
    STATUS.md; each is value-preserving up to float reassociation):

    1. **W-only space-to-depth** (:func:`..ops.s2d.s2dw_conv_weight`):
       doubles every channel count so activations pack the 128-lane HBM
       tile exactly — the plain trunk's 32/64-channel intermediates tile to
       128 lanes and pay 4x/2x read+write amplification, which is what the
       trunk's runtime is actually bound by — at 2x nominal FLOPs.
    2. **Source-grouping**: a dense block's stage ``i`` conv over the
       growing concat splits as ``conv_i(concat) = Σ_j conv_i^{(j)}(x_j)``;
       regrouping by source ``j`` turns 5 narrow convs (32-out) into 5 wide
       ones (outputs 384/320/256/192/128 after the W-s2d doubling).

    Returns keys ``RRDB_trunk.N.RDBd.srcJ.weight`` (one per source tensor)
    and doubled biases under the original bias names, plus the transformed
    ``trunk_conv`` pair.  Equivalent reference computation:
    ``src/face_crop_plus/models/rrdb.py:12-61`` (ResidualDenseBlock_5C /
    RRDB modules).
    """
    out = {}
    for i in range(num_blocks):
        for d in (1, 2, 3):
            name = f"RRDB_trunk.{i}.RDB{d}"
            ws = [
                s2dw_conv_weight(np.asarray(params[f"{name}.conv{k}.weight"]))
                for k in range(1, 6)
            ]
            for j in range(5):
                lo = 2 * (_NF + (j - 1) * _GC) if j >= 1 else 0
                hi = lo + 2 * (_GC if j >= 1 else _NF)
                parts = [
                    ws[k][:, :, lo:hi, :] for k in range(j, 5) if ws[k].shape[2] > lo
                ]
                out[f"{name}.src{j}.weight"] = (
                    np.concatenate(parts, axis=3) if len(parts) > 1 else parts[0]
                )
            for k in range(1, 6):
                out[f"{name}.conv{k}.bias"] = s2dw_bias(
                    np.asarray(params[f"{name}.conv{k}.bias"])
                )
    out["trunk_conv.weight"] = s2dw_conv_weight(np.asarray(params["trunk_conv.weight"]))
    out["trunk_conv.bias"] = s2dw_bias(np.asarray(params["trunk_conv.bias"]))
    return out


def _dense_block_ws2d(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Source-grouped dense block on W-s2d activations (N, H, W/2, 128).

    ``cJ = conv(x_J, srcJ)`` holds x_J's contributions to every later
    stage, laid out ``[next stage | ... | stage 5]``; each stage sums the
    slices that target it, adds its (doubled) bias, and applies leaky-relu.

    The wide contribution tensors (384/320/256/192/128 channels) are
    *stored* in the activation dtype (bf16 on TPU) — the MXU still
    accumulates each conv in f32, the cast fuses into the conv epilogue,
    and the stage sums upcast slices back to f32.  This trunk is
    HBM-bandwidth-bound (STATUS lever table), and the cJ buffers are its
    dominant traffic term, so halving their bytes is a direct win (it also
    doubles the OOM-free strip budget).
    """
    gc2 = 2 * _GC
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(inp, w):
        out = jax.lax.conv_general_dilated(
            inp, w.astype(inp.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype)

    def f32(t):
        return t.astype(jnp.float32)

    g = [p.get(f"{name}.src{j}.weight", (), "zeros") for j in range(5)]
    b = [p.get(f"{name}.conv{k}.bias", (), "zeros").astype(jnp.float32)
         for k in range(1, 6)]
    c0 = conv(x, g[0])
    x1 = leaky_relu((f32(c0[..., :gc2]) + b[0]).astype(x.dtype), _SLOPE)
    c1 = conv(x1, g[1])
    x2 = leaky_relu(
        (f32(c0[..., gc2:2 * gc2]) + f32(c1[..., :gc2]) + b[1]).astype(x.dtype),
        _SLOPE)
    c2 = conv(x2, g[2])
    x3 = leaky_relu(
        (f32(c0[..., 2 * gc2:3 * gc2]) + f32(c1[..., gc2:2 * gc2])
         + f32(c2[..., :gc2]) + b[2]).astype(x.dtype), _SLOPE)
    c3 = conv(x3, g[3])
    x4 = leaky_relu(
        (f32(c0[..., 3 * gc2:4 * gc2]) + f32(c1[..., 2 * gc2:3 * gc2])
         + f32(c2[..., gc2:2 * gc2]) + f32(c3[..., :gc2]) + b[3]).astype(x.dtype),
        _SLOPE)
    c4 = conv(x4, g[4])
    x5 = (f32(c0[..., 4 * gc2:]) + f32(c1[..., 3 * gc2:]) + f32(c2[..., 2 * gc2:])
          + f32(c3[..., gc2:]) + f32(c4) + b[4]).astype(x.dtype)
    return x5 * jnp.asarray(0.2, x.dtype) + x


#: Rows of exact halo a stripped dense block needs: 5 stacked 3x3 stride-1
#: convs extend the receptive field by one row per conv.
_DENSE_HALO = 5


def _dense_block_ws2d_strips(
    p: Params, name: str, x: jnp.ndarray, strip_rows: int
) -> jnp.ndarray:
    """H-strip execution of :func:`_dense_block_ws2d` — exact, memory-bounded.

    The grouped block's wide f32 conv outputs (384/320/256/192/128 channels)
    make its live set ~10x the plain trunk's, OOMing 16 GB HBM at 1024²
    (VERDICT r2 weak #3).  Stacked 3x3 stride-1 convs have a 1-row/conv
    receptive field, so running the block over horizontal strips with a
    :data:`_DENSE_HALO`-row halo is *exact*:

    * Strip s outputs original rows ``[p_s, p_s + R)`` with
      ``p_s = min(s*R, H-R)`` (the last strip is shifted up; overlapping
      rows recompute identical values).
    * Its input window starts at ``a_s = clip(p_s - halo, 0, H - L)`` with
      ``L = R + 2*halo``: interior cut edges carry ``halo`` rows whose
      progressive zero-pad corruption (one row per conv) never reaches the
      output rows, while windows touching the true image edge start/end
      exactly there, so the convs' own zero padding applies — bit-identical
      to the unstripped block.
    * ``lax.map`` runs strips *sequentially* in one compiled body: peak
      memory is one strip's live set, not the full image's.
    """
    n, h, w2, c = x.shape
    r = strip_rows
    halo = _DENSE_HALO
    length = r + 2 * halo
    if h <= length:
        return _dense_block_ws2d(p, name, x)

    n_strips = -(-h // r)
    p_s = np.minimum(np.arange(n_strips) * r, h - r)
    a_s = np.clip(p_s - halo, 0, h - length)
    o_s = p_s - a_s

    def body(args):
        a, o = args
        xs = jax.lax.dynamic_slice_in_dim(x, a, length, axis=1)
        ys = _dense_block_ws2d(p, name, xs)
        return jax.lax.dynamic_slice_in_dim(ys, o, r, axis=1)

    ys = jax.lax.map(
        body, (jnp.asarray(a_s, jnp.int32), jnp.asarray(o_s, jnp.int32))
    )  # (S, N, R, W2, C)

    # Reassemble: strips 0..S-2 tile [0, (S-1)*R); the last strip covers
    # [H-R, H) — keep its trailing H-(S-1)*R rows.
    main = jnp.moveaxis(ys[:-1], 0, 1).reshape(n, (n_strips - 1) * r, w2, c)
    tail_rows = h - (n_strips - 1) * r
    tail = ys[-1][:, r - tail_rows :]
    return jnp.concatenate([main, tail], axis=1)


def rrdbnet_forward_ws2d(
    p: Params,
    p_ws2d: Params,
    x: jnp.ndarray,
    num_blocks: int = _NUM_BLOCKS,
    strip_rows: int | None = None,
) -> jnp.ndarray:
    """RRDBNet forward with the trunk in W-s2d source-grouped form (even W).

    Mathematically identical to :func:`rrdbnet_forward`; the production TPU
    path (measured 1.75x the plain trunk at 512², see STATUS.md).  With
    ``strip_rows`` the dense blocks execute in H-strips with exact halos
    (:func:`_dense_block_ws2d_strips`), bounding the live set so large
    interims (the detect-mode 1024² default) keep the fast trunk.
    """
    fea0 = conv2d(p, "conv_first", x, _NF, bias=True)
    t = space_to_depth_w(fea0)
    for i in range(num_blocks):
        name = f"RRDB_trunk.{i}"
        out = t
        for d in (1, 2, 3):
            if strip_rows is None:
                out = _dense_block_ws2d(p_ws2d, f"{name}.RDB{d}", out)
            else:
                out = _dense_block_ws2d_strips(
                    p_ws2d, f"{name}.RDB{d}", out, strip_rows
                )
        t = out * jnp.asarray(0.2, x.dtype) + t
    fea = fea0 + depth_to_space_w(conv2d(p_ws2d, "trunk_conv", t, _NF * 2, bias=True))
    return _tail(p, fea)


def rrdbnet_forward_s2d(
    p: Params, p_s2d: Params, x: jnp.ndarray, num_blocks: int = _NUM_BLOCKS
) -> jnp.ndarray:
    """RRDBNet forward with the trunk in space-to-depth form (even H, W).

    Mathematically identical to :func:`rrdbnet_forward` (see
    ``ops/s2d.py``): the 23-block trunk — 345 channel-starved 3x3 convs —
    runs at half spatial resolution with 4x channels so its conv outputs
    fill the 128-wide MXU; ``p_s2d`` holds the transformed trunk weights
    under the original names.
    """
    fea0 = conv2d(p, "conv_first", x, _NF, bias=True)
    t = space_to_depth(fea0)
    for i in range(num_blocks):
        t = _rrdb(p_s2d, f"RRDB_trunk.{i}", t, m=4)
    fea = fea0 + depth_to_space(conv2d(p_s2d, "trunk_conv", t, _NF * 4, bias=True))
    return _tail(p, fea)


def mean_face_factor(
    landmarks: np.ndarray, indices: list[int], n_images: int, image_hw: tuple[int, int]
) -> np.ndarray:
    """Per-image mean face-area factor from 5-point landmarks (host).

    Face extent is the (right mouth − left eye) vector — reference
    rrdb.py:137-138 — whose w*h is divided by the image area.  Images with
    no faces get NaN (the reference skips them entirely).
    """
    factors = np.full(n_images, np.nan, np.float64)
    if len(indices) == 0:
        return factors
    idx = np.asarray(indices)
    wh = landmarks[:, 4] - landmarks[:, 0]  # (F, 2)
    f = wh[:, 0] * wh[:, 1] / float(image_hw[0] * image_hw[1])
    sums = np.zeros(n_images)
    cnts = np.zeros(n_images)
    np.add.at(sums, idx, f)
    np.add.at(cnts, idx, 1)
    has = cnts > 0
    factors[has] = sums[has] / cnts[has]
    return factors


class RRDBNet:
    """Quality enhancer matching the reference's predict contract."""

    def __init__(
        self,
        min_face_factor: float = 0.001,
        enh_batch_size: int = 1,
        weights_dir: str | None = None,
        device=None,
        mesh=None,
        compute_dtype=None,
        num_blocks: int = _NUM_BLOCKS,
        # Deprecated alias for trunk_mode="s2d": measured on TPU v5e at 512²
        # (23 blocks, bf16) the full-s2d trunk sustains ~4x the MXU FLOP/s of
        # the plain trunk (60 vs 15 TF/s) but identical wall time — the 4x
        # FLOP inflation exactly pays for the packing gain (see ops/s2d.py).
        use_s2d: bool = False,
        # Trunk execution strategy: "plain" (direct translation of the conv
        # stack), "ws2d" (W-only space-to-depth + source-grouped dense
        # blocks — measured 1.75x plain on TPU v5e at 512²; needs even W),
        # "s2d" (full transform, kept for study), or "auto" (ws2d on TPU,
        # plain elsewhere).  All modes are exact up to float reassociation.
        trunk_mode: str = "auto",
    ):
        self.min_face_factor = float(min_face_factor)
        self.enh_batch_size = int(enh_batch_size)
        self.device = device
        self.mesh = mesh
        self.num_blocks = int(num_blocks)
        self._params_s2d = None
        self._params_ws2d = None

        platform = (device or jax.devices()[0]).platform
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
        self.compute_dtype = compute_dtype

        if use_s2d:
            trunk_mode = "s2d"
        elif trunk_mode == "auto":
            trunk_mode = "ws2d" if platform == "tpu" else "plain"
        if trunk_mode not in ("plain", "ws2d", "s2d"):
            raise ValueError(f"unknown trunk_mode: {trunk_mode!r}")
        self.trunk_mode = trunk_mode
        self.use_s2d = trunk_mode == "s2d"  # kept for backward compatibility

        if mesh is not None:
            # SR sub-batches must split evenly over the data axis.
            self.enh_batch_size = -(-self.enh_batch_size // mesh.size) * mesh.size

        data, self.pretrained = load_or_init("rrdb", self._init_fn(), weights_dir)
        params = {k: jnp.asarray(v, jnp.float32) for k, v in data.items()}
        if mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
        elif device is not None:
            params = jax.device_put(params, device)
        self.params = params

    def _init_fn(self):
        nb = self.num_blocks

        def init():
            from ..ops.nn import init_structure

            return init_structure(rrdbnet_forward, (1, 16, 16, 3), 2, nb)

        return init

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def _sr_uint8(
        self, forward, images: jnp.ndarray, src_hw=None, pack_out=False
    ) -> jnp.ndarray:
        """uint8 (B, H, W, 3) → enhanced uint8 (B, H, W, 3), fully fused.

        SR at 4x then exact bicubic x0.25 back, clamp to [0,1], x255, round
        — reference rrdb.py:142-144.

        ``src_hw`` marks ``images`` as packed YCbCr 4:2:0 rows (B, L) of
        that (h, w): the RGB reconstruction runs here on device (packed
        source uploads cross the link at 1.5 bytes/pixel).  ``pack_out``
        returns the enhanced batch as packed 4:2:0 rows instead of RGB —
        the JPEG encoder's lossy front half, for JPEG-bound saves.
        """
        from ..ops.warp import to_uint8

        if src_hw is not None:
            from ..ops.yuv import yuv420_to_rgb

            images = yuv420_to_rgb(images, *src_hw)
        x = (images.astype(jnp.float32) / 255.0).astype(self.compute_dtype)
        hr = forward(x).astype(jnp.float32)
        lr = downscale4x_bicubic(hr)
        out = to_uint8(jnp.clip(lr, 0.0, 1.0) * 255.0)
        if pack_out:
            from ..ops.yuv import rgb_to_yuv420

            out = rgb_to_yuv420(out)
        return out

    @partial(jax.jit, static_argnames=("self", "src_hw", "pack_out"))
    def _enhance(
        self, params: dict, images: jnp.ndarray, src_hw=None, pack_out=False
    ) -> jnp.ndarray:
        p = Params(params)
        return self._sr_uint8(
            lambda x: rrdbnet_forward(p, x, self.num_blocks),
            images,
            src_hw,
            pack_out,
        )

    @partial(jax.jit, static_argnames=("self", "src_hw", "pack_out"))
    def _enhance_s2d(
        self,
        params: dict,
        params_s2d: dict,
        images: jnp.ndarray,
        src_hw=None,
        pack_out=False,
    ) -> jnp.ndarray:
        """Same contract as :meth:`_enhance`, trunk in space-to-depth form."""
        p, ps = Params(params), Params(params_s2d)
        return self._sr_uint8(
            lambda x: rrdbnet_forward_s2d(p, ps, x, self.num_blocks),
            images,
            src_hw,
            pack_out,
        )

    @partial(jax.jit, static_argnames=("self", "strip_rows", "src_hw", "pack_out"))
    def _enhance_ws2d(
        self,
        params: dict,
        params_ws2d: dict,
        images: jnp.ndarray,
        strip_rows: int | None = None,
        src_hw=None,
        pack_out=False,
    ) -> jnp.ndarray:
        """Same contract as :meth:`_enhance`, trunk in W-s2d grouped form.

        ``strip_rows`` (static) runs the dense blocks in exact H-strips so
        large interims fit HBM (see :func:`_dense_block_ws2d_strips`)."""
        p, ps = Params(params), Params(params_ws2d)
        return self._sr_uint8(
            lambda x: rrdbnet_forward_ws2d(p, ps, x, self.num_blocks, strip_rows),
            images,
            src_hw,
            pack_out,
        )

    def _ws2d_params(self) -> dict:
        """Transformed+grouped trunk weights, built once on first even-W
        batch (compute-dtype storage; ~4x the plain trunk's parameter bytes
        at bf16, i.e. ~128 MB for the full 23-block network)."""
        if self._params_ws2d is None:
            host = {
                k: np.asarray(v)
                for k, v in self.params.items()
                if k.startswith(("trunk_conv.", "RRDB_trunk."))
            }
            data = make_ws2d_grouped_trunk_params(host, self.num_blocks)
            params = {
                k: jnp.asarray(v, jnp.float32 if k.endswith(".bias") else self.compute_dtype)
                for k, v in data.items()
            }
            if self.mesh is not None:
                from ..parallel.mesh import shard_params

                params = shard_params(params, self.mesh)
            elif self.device is not None:
                params = jax.device_put(params, self.device)
            self._params_ws2d = params
        return self._params_ws2d

    def _s2d_params(self) -> dict:
        """Transformed trunk weights, built once on first even-shape batch.

        Only the blocks the forward actually reads are transformed, and the
        (16x-inflated, 75%-zeros) result is stored in ``compute_dtype`` —
        ``conv2d`` casts weights to the activation dtype anyway, so bf16
        storage on TPU is behavior-identical and halves the HBM footprint.
        """
        if self._params_s2d is None:
            keep = ("trunk_conv.",) + tuple(
                f"RRDB_trunk.{i}." for i in range(self.num_blocks)
            )
            host = {
                k: np.asarray(v) for k, v in self.params.items() if k.startswith(keep)
            }
            data = transform_conv_params(host)
            params = {k: jnp.asarray(v, self.compute_dtype) for k, v in data.items()}
            if self.mesh is not None:
                from ..parallel.mesh import shard_params

                params = shard_params(params, self.mesh)
            elif self.device is not None:
                params = jax.device_put(params, self.device)
            self._params_s2d = params
        return self._params_s2d

    def _run_sr(
        self,
        imgs: jnp.ndarray,
        mode: str,
        strip_rows: int | None = None,
        src_hw=None,
        pack_out=False,
    ) -> jnp.ndarray:
        if mode == "ws2d":
            return self._enhance_ws2d(
                self.params, self._ws2d_params(), imgs, strip_rows, src_hw, pack_out
            )
        if mode == "s2d":
            return self._enhance_s2d(
                self.params, self._s2d_params(), imgs, src_hw, pack_out
            )
        return self._enhance(self.params, imgs, src_hw, pack_out)

    #: Pixel budget for an *unstripped* ws2d dense block.  Its source-grouped
    #: wide conv outputs (384/320/256/192/128 channels, f32 until the stage
    #: sums) make the per-block live set ~10x the plain trunk's; measured on
    #: a 16 GB v5e, 1024² inputs OOM unstripped (XLA reports a 32 GB
    #: program) while 512² runs comfortably.  Larger inputs now run the
    #: dense blocks in exact H-strips sized to this budget
    #: (:func:`_dense_block_ws2d_strips`) instead of losing the fast trunk.
    ws2d_max_pixels: int = 512 * 512 * 5 // 4

    #: Per-*strip* pixel budget when the blocks run stripped.  Larger than
    #: the unstripped budget on purpose: a strip is the only wide-output
    #: tensor alive at a time, so it can take more of HBM.  Measured on a
    #: 16 GB v5e at 1024²: 512-row strips (0.53 MP) run OOM-free and beat
    #: 320-row strips by 1.2x (less lax.map slice traffic); the unstripped
    #: 1 MP block does not fit.
    ws2d_strip_pixels: int = 512 * 1024

    def _mode_for_shape(self, h: int, w: int) -> tuple[str, int | None]:
        """Resolves (trunk mode, strip_rows) for a batch shape.

        ws2d needs even W; above the unstripped pixel budget the dense
        blocks run in H-strips whose rows fit the strip budget (inputs so
        wide that even the minimum 32-row strip busts it fall back to the
        plain trunk — its live set is ~10x smaller).  Full s2d needs both
        dims even.  Anything else falls back to the plain trunk (with a
        once-per-process log so the fallback is visible)."""
        reason = None
        if self.trunk_mode == "ws2d" and w % 2 == 0:
            if h * w <= self.ws2d_max_pixels:
                return "ws2d", None
            if 32 * w <= self.ws2d_strip_pixels:
                # Strip rows: fill the per-strip budget with the fewest,
                # most even strips (overlap waste is lowest when rows
                # divides h), 8-row aligned, >= 32.
                rows_max = self.ws2d_strip_pixels // w
                n_strips = -(-h // rows_max)
                rows = max(32, (-(-h // n_strips) + 7) & ~7)
                if h > rows + 2 * _DENSE_HALO:
                    return "ws2d", rows
                return "ws2d", None
            reason = "minimum 32-row strip exceeds the HBM strip budget"
        if self.trunk_mode == "s2d" and h % 2 == 0 and w % 2 == 0:
            return "s2d", None
        if self.trunk_mode != "plain" and not getattr(self, "_fallback_logged", False):
            self._fallback_logged = True
            import logging

            logging.getLogger(__name__).info(
                "trunk_mode=%s unavailable for shape (%d, %d) (%s); "
                "running the plain trunk",
                self.trunk_mode, h, w,
                reason or ("odd width" if w % 2 else "odd height"),
            )
        return "plain", None

    def enhance_images(
        self, images: np.ndarray, src_hw=None, pack_out: bool = False
    ) -> np.ndarray:
        """Enhances a uniform uint8 batch in fixed-size sub-batches.

        ``src_hw`` marks ``images`` as packed YCbCr 4:2:0 rows (N, L) of
        that (h, w), reconstructed on device (packed source uploads);
        ``pack_out`` returns packed 4:2:0 rows (N, L) instead of RGB for
        JPEG-bound saves (h and w must be even; callers gate on this).
        """
        if src_hw is not None:
            src_hw = (int(src_hw[0]), int(src_hw[1]))
            h, w = src_hw
        else:
            h, w = int(images.shape[1]), int(images.shape[2])
        mode, strip_rows = self._mode_for_shape(h, w)
        if pack_out:
            from ..ops.yuv import packed_length

            out = np.empty((len(images), packed_length((w, h))), np.uint8)
        else:
            out = np.empty((len(images), h, w, 3), np.uint8)
        bs = self.enh_batch_size
        for start in range(0, len(images), bs):
            chunk = images[start : start + bs]
            valid = len(chunk)
            if valid < bs:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - valid, axis=0)], axis=0
                )
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                imgs = shard_batch(chunk, self.mesh)
            else:
                imgs = jnp.asarray(chunk)
                if self.device is not None:
                    imgs = jax.device_put(imgs, self.device)
            res = self._run_sr(imgs, mode, strip_rows, src_hw, pack_out)
            out[start : start + valid] = np.asarray(res)[:valid]
        return out

    def enhance_device(self, images: jnp.ndarray) -> jnp.ndarray:
        """Enhances a device-resident uint8 batch, staying on device.

        Device-to-device variant of :meth:`enhance_images` for fused
        pipelines: sub-batches of ``enh_batch_size`` run through the jitted
        SR program; a short tail sub-batch repeats its last row (padding
        rows are sliced off before returning).
        """
        mode, strip_rows = self._mode_for_shape(images.shape[1], images.shape[2])
        n, bs = images.shape[0], self.enh_batch_size
        outs = []
        for start in range(0, n, bs):
            idx = np.minimum(np.arange(start, start + bs), n - 1)
            chunk = (
                images  # single full-size chunk: no gather needed
                if n == bs
                else jnp.take(images, jnp.asarray(idx), axis=0)
            )
            res = self._run_sr(chunk, mode, strip_rows)
            outs.append(res[: min(bs, n - start)])
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def predict(
        self,
        images: np.ndarray | list[np.ndarray],
        landmarks: np.ndarray | None,
        indices: list[int] | None,
        pack_out: bool = False,
    ) -> np.ndarray | list[np.ndarray]:
        """Enhances images whose mean face factor is <= the threshold.

        Same gate semantics as reference rrdb.py:83-146: no landmarks/indices
        → enhance everything; images without any face → left untouched.
        Accepts a uniform (N, H, W, 3) batch or a ragged list (grouped by
        shape into buckets for the device).  List entries may be
        :class:`~face_crop_plus_tpu.utils.io.PackedYUVImage` (packed source
        uploads — reconstructed on device, no host RGB materialization);
        with ``pack_out`` (list input only) enhanced even-dimension images
        come back as ``PackedYUVImage`` for JPEG-bound saves.
        """
        is_list = isinstance(images, list)
        if pack_out and not is_list:
            raise ValueError("pack_out requires list input")
        n = len(images)
        if n == 0:  # the reference's loop body never runs for empty input
            return images
        h0, w0 = images[0].shape[:2]

        if landmarks is None or indices is None:
            gated = list(range(n))
        else:
            factors = mean_face_factor(np.asarray(landmarks), indices, n, (h0, w0))
            gated = [
                i
                for i in range(n)
                if np.isfinite(factors[i]) and factors[i] <= self.min_face_factor
            ]

        if not gated:
            return images

        if not is_list:
            sub = self.enhance_images(np.asarray(images)[gated])
            out = np.array(images, copy=True)
            out[gated] = sub
            return out

        # Ragged list: bucket gated images by shape (packed 4:2:0 sources
        # group separately from RGB arrays of the same dimensions).
        from ..utils.io import PackedYUVImage

        out = list(images)
        by_shape = defaultdict(list)
        for i in gated:
            by_shape[getattr(images[i], "group_key", images[i].shape)].append(i)
        for ids in by_shape.values():
            first = images[ids[0]]
            h, w = first.shape[:2]
            pack = pack_out and h % 2 == 0 and w % 2 == 0
            if isinstance(first, PackedYUVImage):
                sub = self.enhance_images(
                    np.stack([images[i].packed for i in ids]),
                    src_hw=(h, w),
                    pack_out=pack,
                )
            else:
                sub = self.enhance_images(
                    np.stack([images[i] for i in ids]), pack_out=pack
                )
            for j, i in enumerate(ids):
                out[i] = PackedYUVImage(sub[j], h, w) if pack else sub[j]
        return out
