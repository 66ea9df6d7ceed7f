"""Headline benchmark: faces cropped/sec/chip (detect + align + crop).

Measures the end-to-end device pipeline (RetinaFace detection at the interim
resize size -> batched similarity transform -> batched warp crop) on
pre-decoded in-memory images, which is BASELINE.json config 2's compute path.
The denominator (``vs_baseline``) is the same pipeline measured on the host
CPU backend (the reference is a CPU/GPU torch+cv2 pipeline with no published
numbers — BASELINE.md mandates a measured denominator); the CPU number is
cached in ``.bench_cpu.json`` so repeat runs only measure the accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "faces/sec/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESIZE = (1024, 1024)
OUTPUT = (256, 256)
BATCH = 8
CPU_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu.json")
DEMO_DIR = "/root/reference/demo/input_images"


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def load_images(n: int) -> np.ndarray:
    """n pre-decoded, batch-normalized 1024x1024 uint8 images."""
    from face_crop_plus_tpu.utils.batching import as_batch
    from face_crop_plus_tpu.utils.io import imread_rgb

    raw = []
    if os.path.isdir(DEMO_DIR):
        for f in sorted(os.listdir(DEMO_DIR)):
            img = imread_rgb(os.path.join(DEMO_DIR, f))
            if img is not None:
                raw.append(img)
    if not raw:
        rng = np.random.default_rng(0)
        raw = [rng.integers(0, 255, (720, 960, 3), dtype=np.uint8) for _ in range(8)]
    images = [raw[i % len(raw)] for i in range(n)]
    batch, _, paddings = as_batch(images, RESIZE)
    return batch, paddings


def build_pipeline(device_str: str):
    import jax

    from face_crop_plus_tpu.cropper import Cropper, _resolve_device

    device = _resolve_device(device_str)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cropper = Cropper(
            output_size=OUTPUT,
            resize_size=RESIZE,
            strategy="largest",
            det_threshold=0.6,
            enh_threshold=None,
            batch_size=BATCH,
            device=device_str,
        )
    # With random weights no real score clears 0.6; vis=-1 keeps exactly one
    # face per image (strategy largest), which is the realistic per-image
    # workload for CelebA-style data.
    cropper.det_model.vis_threshold = -1.0
    return cropper, device


def measure(device_str: str, n_images: int, reps: int) -> float:
    """Times the fused detect+align+crop pipeline with batches in flight.

    Matches production structure: per batch, one uint8 upload, one fused
    XLA program, one uint8 crop download; JAX async dispatch keeps the next
    batch's upload/compute overlapped with the previous one's download.
    """
    import jax
    import jax.numpy as jnp

    cropper, device = build_pipeline(device_str)
    fused = cropper._fused
    batch, _ = load_images(BATCH)
    ih, iw = RESIZE[1], RESIZE[0]

    def submit():
        imgs = jax.device_put(batch, device)
        return fused._run(fused.det.params, imgs, ih, iw)

    # Warmup / compile.
    t0 = time.perf_counter()
    crops, _lm, valid = submit()
    jax.block_until_ready(crops)
    log(f"[{device_str}] compile+first batch: {time.perf_counter() - t0:.1f}s")

    n_batches = max(1, n_images // BATCH) * reps
    faces = 0
    inflight = []
    t0 = time.perf_counter()
    for _ in range(n_batches):
        inflight.append(submit())
        if len(inflight) >= 3:  # bounded pipeline depth
            c, _l, v = inflight.pop(0)
            faces += int(np.asarray(v).sum())
            np.asarray(c)  # realize the crop download
    for c, _l, v in inflight:
        faces += int(np.asarray(v).sum())
        np.asarray(c)
    dt = time.perf_counter() - t0
    fps = faces / dt
    log(f"[{device_str}] {faces} faces in {dt:.2f}s -> {fps:.2f} faces/s")
    return fps


def cpu_baseline() -> float:
    if os.path.isfile(CPU_CACHE):
        with open(CPU_CACHE) as f:
            cached = json.load(f)
        if cached.get("config") == [RESIZE, OUTPUT, BATCH]:
            log(f"[cpu] cached baseline: {cached['fps']:.3f} faces/s")
            return cached["fps"]
    fps = measure("cpu", n_images=8, reps=1)
    try:
        with open(CPU_CACHE, "w") as f:
            json.dump({"config": [RESIZE, OUTPUT, BATCH], "fps": fps}, f)
    except OSError:
        pass
    return fps


def main():
    import jax

    platforms = {d.platform for d in jax.devices()}
    accel = "tpu" if "tpu" in platforms else sorted(platforms)[0]
    log(f"devices: {jax.devices()}")

    if accel == "cpu":
        value = measure("cpu", n_images=16, reps=2)
        base = value
    else:
        value = measure(accel, n_images=64, reps=4)
        base = cpu_baseline()

    print(
        json.dumps(
            {
                "metric": "faces cropped/sec/chip (detect+align+crop, 1024px)",
                "value": round(value, 2),
                "unit": "faces/sec/chip",
                "vs_baseline": round(value / base, 2) if base else None,
            }
        )
    )


if __name__ == "__main__":
    main()
