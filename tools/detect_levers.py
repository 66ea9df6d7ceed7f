"""Detect-path perf levers, measured on chip (VERDICT r2 next-step #2).

Levers over the fused single-dispatch detect program (the headline bench's
hot program, `pipeline.FusedPipeline._run` at batch 16, 218x178 uint8
sources, 1024² interim):

* batch 16 / 32 / 64 — amortizes per-dispatch overhead, changes XLA tiling;
* bf16 interim — run the device resize+pad and BGR/mean preprocessing in
  bfloat16 instead of float32 (the backbone already computes in bf16; this
  moves the cast before the big interim resize matmuls, halving their
  traffic);
* Pallas vs fori-loop NMS at the realistic candidate count (pre_topk=256).

Each variant reports amortized device-exec ms/image over k back-to-back
dispatches (async enqueue, one block), median of 3 rounds — robust to the
time-shared chip.  FLOPs via compiled cost_analysis for MFU context.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RESIZE = (1024, 1024)
SRC_HW = (218, 178)
OUT = (256, 256)


def build(det):
    """Tool-local fused detect→crop step mirroring FusedPipeline._run, with
    a preprocessing-dtype knob."""
    from face_crop_plus_tpu.models.detection import (
        _BGR_MEAN,
        decode_detections,
        retinaface_forward,
    )
    from face_crop_plus_tpu.ops.anchors import anchor_grid
    from face_crop_plus_tpu.ops.nms import select_faces
    from face_crop_plus_tpu.ops.nn import Params, resize_bilinear
    from face_crop_plus_tpu.ops.transform import estimate_similarity
    from face_crop_plus_tpu.ops.warp import warp_affine_batch
    from face_crop_plus_tpu.pipeline import interim_geometry
    from face_crop_plus_tpu.utils.landmarks import make_target_landmarks

    ih, iw = RESIZE
    target = make_target_landmarks(OUT, 0.65)
    priors_np = anchor_grid(ih, iw)

    def make(pre_dtype, use_pallas):
        def step(params, images, dep):
            # ``dep`` (uint8 scalar, derived from the previous iteration's
            # output) forces genuinely sequential execution when chained —
            # on the tunneled platform block_until_ready alone does not
            # guarantee the enqueued programs ran.
            p = Params(params)
            images = images + dep
            n, h, w, _ = images.shape
            scale, pad = interim_geometry(h, w, (iw, ih))
            t, b, l, r = pad
            hh, ww = ih - t - b, iw - l - r
            x = resize_bilinear(images.astype(pre_dtype), (hh, ww))
            x = jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))
            x = x[..., ::-1] - jnp.asarray(_BGR_MEAN, pre_dtype)
            x = x.astype(jnp.bfloat16)
            scores2, loc, ldm = retinaface_forward(p, x)
            boxes, landms = decode_detections(
                loc, ldm, jnp.asarray(priors_np), (ih, iw)
            )
            sel, valid, caps = select_faces(
                scores2[..., 1].astype(jnp.float32), boxes, landms,
                vis_threshold=-1.0, nms_threshold=0.4, pre_topk=256,
                max_faces=64, strategy="largest", use_pallas=use_pallas,
            )
            face_lm = sel.reshape(n, 5, 2)
            # Un-pad (x, y) then un-scale back to source coordinates.
            face_lm = (face_lm - jnp.asarray([l, t], jnp.float32)) / scale
            mats, ok = estimate_similarity(face_lm, jnp.asarray(target))
            crops = warp_affine_batch(
                images, mats, jnp.arange(n, dtype=jnp.int32), OUT, "constant"
            )
            crops_u8 = jnp.clip(jnp.rint(crops), 0, 255).astype(jnp.uint8)
            dep_out = (crops_u8.sum() % 2).astype(jnp.uint8)
            return crops_u8, face_lm, valid, caps, dep_out

        return jax.jit(step)

    return make


def time_variant(name, fn, params, imgs, rounds=3, k=8):
    out = fn(params, imgs, jnp.uint8(0))
    np.asarray(out[-1])  # on this platform only a host fetch synchronizes
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(params, imgs, out[-1])  # chained: forced sequential
        np.asarray(out[-1])  # final tiny fetch = true barrier
        per.append((time.perf_counter() - t0) / k / imgs.shape[0] * 1e3)
    med = sorted(per)[len(per) // 2]
    log(f"{name:40s} {med:7.2f} ms/img  (rounds: {['%.2f' % p for p in per]})")
    return med


def main():
    import warnings

    from face_crop_plus_tpu.models.detection import RetinaFace
    from face_crop_plus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        det = RetinaFace(strategy="largest", vis=-1.0, device=jax.devices()[0])
    make = build(det)
    rng = np.random.default_rng(0)

    results = {}
    base16 = None
    for batch in (16, 32, 64):
        imgs = jax.device_put(
            rng.integers(0, 255, (batch,) + SRC_HW + (3,), np.uint8),
            jax.devices()[0],
        )
        fn = make(jnp.float32, True)
        ms = time_variant(f"batch={batch} f32-pre pallas-nms", fn, det.params, imgs)
        results[f"batch{batch}"] = ms
        if batch == 16:
            base16 = ms
            imgs16 = imgs

    results["bf16_pre"] = time_variant(
        "batch=16 bf16-pre pallas-nms", make(jnp.bfloat16, True), det.params, imgs16
    )
    results["fori_nms"] = time_variant(
        "batch=16 f32-pre fori-nms", make(jnp.float32, False), det.params, imgs16
    )

    log("\nlever table (vs batch=16 f32-pre pallas-nms):")
    for k, v in results.items():
        log(f"  {k:12s} {v:7.2f} ms/img  {base16 / v:5.2f}x")


if __name__ == "__main__":
    main()
