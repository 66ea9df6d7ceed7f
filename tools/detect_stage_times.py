"""Per-stage device-time attribution for the fused detect program.

Builds truncated programs (preprocess only; +stem; +layer1; ... ; full
detect) and reports the amortized device-exec time of each, chained-dep
forced (tools/detect_levers.py discipline).  Successive diffs attribute time
to stages — the stages are serially dependent, so truncation does not change
what could have overlapped.

Also prints per-stage cost_analysis FLOPs/bytes so each stage gets its own
roofline: stages far from both rooflines are scheduling-inefficiency targets
(lane packing, fusion misses), stages at the bandwidth roofline need
traffic reduction (fused bottlenecks), stages at the FLOPs roofline are
done.
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

# v5e peaks for roofline context.
PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def build_upto(stage):
    from face_crop_plus_tpu.models.backbones import _stage
    from face_crop_plus_tpu.models.detection import (
        _BGR_MEAN,
        _fpn,
        _head,
        _ssh,
        decode_detections,
    )
    from face_crop_plus_tpu.ops.anchors import anchor_grid
    from face_crop_plus_tpu.ops.nms import select_faces
    from face_crop_plus_tpu.ops.nn import (
        Params,
        batch_norm,
        conv2d,
        leaky_relu,
        max_pool,
        resize_bilinear,
        softmax,
    )
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
        if stage == "pre":
            return _fin(x)

        x = conv2d(p, "body.conv1", x, 64, kernel=7, stride=2, padding=3)
        x = leaky_relu(batch_norm(p, "body.bn1", x))
        x = max_pool(x, window=3, stride=2, padding=1)
        if stage == "stem":
            return _fin(x)

        x = _stage(p, "body.layer1", x, 64, 3, stride=1)
        if stage == "layer1":
            return _fin(x)
        c3 = _stage(p, "body.layer2", x, 128, 4, stride=2)
        if stage == "layer2":
            return _fin(c3)
        c4 = _stage(p, "body.layer3", c3, 256, 6, stride=2)
        if stage == "layer3":
            return _fin(c4)
        c5 = _stage(p, "body.layer4", c4, 512, 3, stride=2)
        if stage == "layer4":
            return _fin(c5)

        fpn = _fpn(p, (c3, c4, c5))
        feats = [_ssh(p, f"ssh{i + 1}", f) for i, f in enumerate(fpn)]
        if stage == "fpn_ssh":
            return _fin(feats[0]) + _fin(feats[1]) + _fin(feats[2])

        cls = _head(p, "ClassHead", feats, 2)
        loc = _head(p, "BboxHead", feats, 4)
        ldm = _head(p, "LandmarkHead", feats, 10)
        scores2 = softmax(cls, axis=-1)
        boxes, landms = decode_detections(loc, ldm, jnp.asarray(priors_np), (ih, iw))
        sel, valid, caps = select_faces(
            scores2[..., 1].astype(jnp.float32), boxes, landms,
            vis_threshold=-1.0, nms_threshold=0.4, pre_topk=256,
            max_faces=64, strategy="largest", use_pallas=True,
        )
        return (sel.sum() % 2).astype(jnp.uint8)

    def _fin(x):
        # Tiny, data-dependent output: forces the stage to execute while
        # keeping the fetch O(1).
        return (x.astype(jnp.float32).sum() % 2).astype(jnp.uint8)

    return jax.jit(step)


def time_fn(fn, params, imgs, rounds=3, k=8):
    dep = fn(params, imgs, jnp.uint8(0))
    np.asarray(dep)
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(k):
            dep = fn(params, imgs, dep)
        np.asarray(dep)
        per.append((time.perf_counter() - t0) / k / imgs.shape[0] * 1e3)
    return sorted(per)[len(per) // 2]


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

    stages = ["pre", "stem", "layer1", "layer2", "layer3", "layer4", "fpn_ssh", "full"]
    cum = {}
    cost = {}
    for s in stages:
        fn = build_upto(s)
        compiled = fn.lower(det.params, imgs, jnp.uint8(0)).compile()
        ca = compiled.cost_analysis()
        cost[s] = (ca.get("flops", 0), ca.get("bytes accessed", 0))
        cum[s] = time_fn(fn, det.params, imgs)
        log(f"cumulative {s:8s} {cum[s]:7.2f} ms/img")

    log("\nstage attribution (diffs):")
    log(f"{'stage':10s} {'ms/img':>8s} {'GF/img':>8s} {'GB/img':>8s} "
        f"{'TF/s':>7s} {'GB/s':>7s} {'%peakF':>7s} {'%peakB':>7s}")
    prev_t, prev_f, prev_b = 0.0, 0.0, 0.0
    for s in stages:
        t = cum[s]
        f, b = cost[s][0] / BATCH / 1e9, cost[s][1] / BATCH / 1e9
        dt, df, db = t - prev_t, f - prev_f, b - prev_b
        tfs = df / dt if dt > 1e-6 else 0.0
        gbs = db / dt * 1e3 if dt > 1e-6 else 0.0  # GB per ms -> GB/s
        log(f"{s:10s} {dt:8.2f} {df:8.1f} {db:8.3f} {tfs:7.1f} {gbs*1.0:7.0f} "
            f"{100*tfs/PEAK_TFLOPS:6.1f}% {100*gbs/PEAK_GBS:6.1f}%")
        prev_t, prev_f, prev_b = t, f, b


if __name__ == "__main__":
    main()
