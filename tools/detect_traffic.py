"""Detector activation-traffic attribution + lever sweep (VERDICT r3 #5).

The fused detect program's compiled ``cost_analysis`` reports ~2.8 GB of
memory traffic per 1024² image (75% of the v5e HBM roofline at the measured
4.58 ms/img).  Before spending a round on strips or kernel fusion, this tool
answers *where the bytes are*:

1. **HLO buffer attribution** — parse the optimized HLO module and rank
   top-level instructions by output-buffer size (writes) and operand size
   (reads), grouped by category (conv fusions by dtype, copies, elementwise
   fusions, reduce-windows).  A conv that stores f32 and re-reads it for a
   cast fusion shows up immediately.
2. **Lever variants**, timed with the chained-dependency discipline of
   ``tools/detect_levers.py`` (on this tunnel only a host fetch is a true
   barrier):

   * base (production: conv ``preferred_element_type=f32``, cast to bf16)
   * ``conv_bf16_out``: convs store bf16 directly (MXU still accumulates
     f32 internally for bf16 operands; only the final store rounds) —
     halves every conv-output round trip *if* XLA was materializing f32.
   * ``stem_s2d``: space-to-depth the 7×7/2 stem conv (pad kernel to 8×8,
     s2d×2 input → 4×4/1 conv on 12 channels) — the MLPerf ResNet trick
     for the 3-channel input's terrible lane packing.
   * ``l1_strips``: H-strip execution of stage1 (largest activations).

Each variant reports amortized device-exec ms/img and max |Δ| of the decoded
landmarks vs the f32-accumulate base on the same random weights.
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
BATCH = 16


# ---------------------------------------------------------------------------
# HLO buffer attribution
# ---------------------------------------------------------------------------

_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2,
}


def _shape_bytes(shape_str):
    """Bytes of an HLO shape string like ``f32[16,512,512,64]{3,2,1,0}``."""
    import re

    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def attribute_hlo(compiled, top=25):
    """Ranks top-level HLO instructions of ENTRY by output-buffer bytes."""
    import re

    txt = compiled.as_text()
    # Find the ENTRY computation body.
    m = re.search(r"ENTRY [^{]+\{(.*?)\n\}", txt, re.S)
    body = m.group(1) if m else txt
    rows = []
    for line in body.splitlines():
        line = line.strip()
        # `%name = <shape-with-layout-annotations> op(...)`; the layout part
        # may contain (), : and T(8,128) tokens, so anchor on the trailing
        # `op(` instead of whitelisting shape characters.
        m = re.match(r"(%?[\w.\-]+)\s*=\s*(.*?)\s+([a-z][\w\-]*)\(", line)
        if not m:
            continue
        name, shape, op = m.group(1), m.group(2), m.group(3)
        if op in ("parameter", "constant", "tuple", "get-tuple-element"):
            continue
        b = _shape_bytes(shape)
        if b == 0:
            continue
        # categorize
        cat = op
        if op == "fusion":
            if "conv" in line:
                cat = "fusion(conv)"
            elif "reduce-window" in line:
                cat = "fusion(pool)"
            else:
                cat = "fusion(elem)"
        dt = shape.split("[")[0].split("(")[-1].strip()
        rows.append((b, name, cat, dt, shape[:90]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    log(f"\n-- HLO ENTRY output-buffer writes: {total/1e9:.2f} GB total, "
        f"{len(rows)} instructions --")
    by_cat = {}
    for b, _, cat, dt, _ in rows:
        key = f"{cat}:{dt}"
        by_cat[key] = by_cat.get(key, 0) + b
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        log(f"  {k:28s} {v/1e9:8.3f} GB")
    log(f"\n  top {top} writers:")
    for b, name, cat, dt, shape in rows[:top]:
        log(f"  {b/1e6:9.1f} MB  {cat:14s} {shape}")
    return total, by_cat


# ---------------------------------------------------------------------------
# Program variants
# ---------------------------------------------------------------------------


def build_step(variant):
    from face_crop_plus_tpu.models.detection import (
        _BGR_MEAN,
        decode_detections,
        retinaface_forward,
    )
    from face_crop_plus_tpu.ops.anchors import anchor_grid
    from face_crop_plus_tpu.ops.nms import select_faces
    from face_crop_plus_tpu.ops.nn import Params
    from face_crop_plus_tpu.pipeline import device_resize_pad

    ih, iw = RESIZE
    priors_np = anchor_grid(ih, iw)

    def step(params, images, dep):
        p = Params(params)
        images = images + dep
        n, h, w, _ = images.shape
        x, _, _ = device_resize_pad(images, (iw, ih))
        x = x[..., ::-1] - jnp.asarray(_BGR_MEAN, jnp.float32)
        x = x.astype(jnp.bfloat16)
        scores2, loc, ldm = retinaface_forward(p, x)
        boxes, landms = decode_detections(loc, ldm, jnp.asarray(priors_np), (ih, iw))
        sel, valid, caps = select_faces(
            scores2[..., 1].astype(jnp.float32), boxes, landms,
            vis_threshold=-1.0, nms_threshold=0.4, pre_topk=256,
            max_faces=64, strategy="largest", use_pallas=True,
        )
        face_lm = sel.reshape(n, 5, 2)
        dep_out = (face_lm.sum() % 2).astype(jnp.uint8)
        return face_lm, valid, dep_out

    return jax.jit(step)


def time_variant(name, fn, params, imgs, rounds=3, k=8):
    out = fn(params, imgs, jnp.uint8(0))
    np.asarray(out[-1])
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(params, imgs, out[-1])
        np.asarray(out[-1])
        per.append((time.perf_counter() - t0) / k / imgs.shape[0] * 1e3)
    med = sorted(per)[len(per) // 2]
    log(f"{name:34s} {med:7.2f} ms/img  (rounds: {['%.2f' % p for p in per]})")
    return med, np.asarray(out[0])


def main():
    import warnings

    from face_crop_plus_tpu.models.detection import RetinaFace
    from face_crop_plus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        det = RetinaFace(strategy="largest", vis=-1.0, device=jax.devices()[0])

    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.integers(0, 255, (BATCH,) + SRC_HW + (3,), np.uint8), jax.devices()[0]
    )

    import face_crop_plus_tpu.ops.nn as nn_mod

    variants = sys.argv[1:] or ["base"]
    results = {}
    base_lm = None
    for v in variants:
        os.environ.pop("FCPT_STEM_MODE", None)
        if v == "stem_plain":
            os.environ["FCPT_STEM_MODE"] = "plain"
        elif v == "stem_ws2d":
            os.environ["FCPT_STEM_MODE"] = "ws2d"
        fn = build_step(v)
        if v == variants[0] or "--hlo" in variants:
            lowered = fn.lower(det.params, imgs, jnp.uint8(0))
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            log(f"\n== {v}: cost_analysis flops={ca.get('flops', 0)/1e9:.1f} GF  "
                f"bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB  "
                f"(per img: {ca.get('bytes accessed', 0)/1e9/BATCH:.3f} GB)")
            attribute_hlo(compiled)
        ms, lm = time_variant(v, fn, det.params, imgs)
        if base_lm is None:
            base_lm = lm
        else:
            log(f"   max |d landmark| vs base: {np.abs(lm - base_lm).max():.4f} px")
        results[v] = ms

    log("\nlever table:")
    base = results.get("base") or list(results.values())[0]
    for k, v in results.items():
        log(f"  {k:20s} {v:7.2f} ms/img  {base / v:5.2f}x")


if __name__ == "__main__":
    main()
