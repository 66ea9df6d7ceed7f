"""One-command bench modes for BASELINE.json configs 3/4/5.

Invoked through ``bench.py`` via ``FCPT_BENCH_MODE=enhance|parse|scale``;
each mode emits the same one-line JSON schema as the headline bench.
``vs_baseline`` is the *executing reference* measured on this machine's CPU
(``tools/ref_baseline.py``, cached in ``.bench_ref_cpu.json``) — the
BASELINE.md-mandated denominator.

* ``enhance`` — config 3 metric: RRDB SR megapixels/sec/chip through the
  production ``RRDBNet.enhance_images`` at 512² (normalize → 23-block trunk
  → ×4 tail → bicubic ×0.25 undo → uint8), median of N chained passes.
* ``parse``  — config 4 metric: faces parsed/sec/chip through
  ``BiSeNet.predict`` (512² resize → forward → argmax + histogram grouping)
  on 256² face crops, median of N.
* ``scale``  — config 5: the full detect@1024²+align+crop pipeline over a
  10k-image CelebA-style directory, one e2e pass (faces/sec/chip).
"""

import json
import os
import shutil
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _ref_baseline() -> dict:
    """Cached reference-CPU numbers; measures them if absent (CPU-only work)."""
    try:
        import ref_baseline

        return ref_baseline.run()
    except Exception as e:  # pragma: no cover - reference tree unavailable
        log(f"reference baseline unavailable: {e}")
        return {}


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def host_contention_block(ref_data: dict | None = None) -> dict | None:
    """Host-slowdown fingerprint for the artifact (host analog of the
    device contention index).

    Re-runs the fixed-work codec probe and reports it next to the value
    captured when the reference-CPU denominators were measured, so a
    ``vs_baseline`` computed on a loaded shared host reads as contention
    (host_slowdown > 1) rather than as a pipeline regression.
    """
    try:
        from face_crop_plus_tpu.utils.profiling import host_speed_probe

        now = host_speed_probe()
        if now is None:
            return None
        if ref_data is None:
            ref_data = _ref_baseline()
        cap = (ref_data or {}).get("host_probe_rtps")
        blk = {"probe_rtps_now": round(now, 1)}
        if cap:
            blk["probe_rtps_at_baseline_capture"] = round(cap, 1)
            blk["host_slowdown"] = round(cap / now, 2)
        return blk
    except Exception:  # pragma: no cover - environment-dependent
        return None


def _sr_device_profile(model, size: int) -> dict | None:
    """Contention-aware profile of the exact SR program the bench runs."""
    import bench
    import jax
    import jax.numpy as jnp

    mode, strip_rows = model._mode_for_shape(size, size)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (1, size, size, 3), np.uint8))
    if model.device is not None:
        imgs = jax.device_put(imgs, model.device)

    @jax.jit
    def run(images):
        return model._run_sr(images, mode, strip_rows)

    def step(dep):
        out = run(imgs + dep)
        return (out.astype(jnp.int32).sum() % 2).astype(jnp.uint8)

    try:
        lowered = run.lower(imgs)
    except Exception:  # pragma: no cover - backend-dependent API
        lowered = None
    return bench.profile_program(
        f"rrdb_sr({mode}{'' if strip_rows is None else f',strips={strip_rows}'})@{size}²",
        step,
        size * size / 1e6,
        "MP",
        lowered=lowered,
        device=model.device,
    )


def run_enhance() -> dict:
    import jax

    from face_crop_plus_tpu.models.enhancement import RRDBNet
    from face_crop_plus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    size = int(os.environ.get("FCPT_BENCH_SR_SIZE", "512"))
    passes = int(os.environ.get("FCPT_BENCH_PASSES", "5"))
    dev = jax.devices()[0]
    model = RRDBNet(device=dev)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (1, size, size, 3), np.uint8)

    t0 = time.perf_counter()
    y = model.enhance_images(x)
    warmup_s = time.perf_counter() - t0
    log(f"[enhance] compile+first: {warmup_s:.1f}s (trunk_mode={model.trunk_mode})")

    mps_list = []
    for p in range(passes):
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            y = model.enhance_images(y)  # chained: forces execution
        dt = (time.perf_counter() - t0) / reps
        mps_list.append(round(size * size / dt / 1e6, 4))
        log(f"[enhance] pass {p}: {dt * 1e3:.0f} ms/img -> {mps_list[-1]} MP/s")

    value = _median(mps_list)
    profile = _sr_device_profile(model, size)
    base = _ref_baseline().get("rrdb_sr", {}).get("mp_per_s")

    # Release the standalone model's device buffers before the e2e run
    # constructs a full Cropper (detector + a second RRDBNet): two resident
    # SR weight sets can OOM smaller accelerators mid-bench.
    del model, x, y
    # A failure in the long e2e run must not discard the already-measured
    # headline SR metric.
    try:
        e2e = _enhance_e2e()
    except Exception as e:  # pragma: no cover - depends on device state
        log(f"[enhance] e2e run failed: {e}")
        e2e = {"error": str(e)}

    return {
        "metric": f"RRDB SR megapixels/sec/chip (e2e enhance_images at {size}²)",
        "value": value,
        "unit": "MP/s/chip",
        "vs_baseline": round(value / base, 1) if base else None,
        "baseline": {"reference_cpu_mp_per_s": base},
        "method": f"median of {passes} chained passes",
        "passes": mps_list,
        "e2e_detect_gated_sr": e2e,
        "warmup_s": round(warmup_s, 1),
        "device_profile": profile,
        "host_contention": host_contention_block(),
    }


def _enhance_e2e() -> dict | None:
    """Secondary figure matching BASELINE.json config 3 verbatim: detection
    at a 512² interim + small-face-gated RRDB SR, through ``process_dir``.

    The gate threshold is set high so *every* bench image gates in — the
    maximum-SR-work case (each gated image super-resolves the full 512²
    interim).  With packed uploads eligible this drives
    ``_run_detect_interim_packed``: gated images SR the device-computed
    interim and crops warp the device reconstruction, so no pixel recrosses
    the host↔device link.  Skipped with ``FCPT_BENCH_ENH_E2E=0``.
    """
    if os.environ.get("FCPT_BENCH_ENH_E2E", "1") == "0":
        return None
    import warnings

    import bench
    import jax

    from face_crop_plus_tpu import Cropper

    platforms = {d.platform for d in jax.devices()}
    accel = "tpu" if "tpu" in platforms else sorted(platforms)[0]
    size = int(os.environ.get("FCPT_BENCH_ENH_E2E_SIZE", "512"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cropper = Cropper(
            output_size=bench.OUTPUT,
            resize_size=(size, size),
            strategy="largest",
            det_threshold=0.6,
            enh_threshold=1e9,  # mean face factor is finite -> all gate in
            batch_size=8,
            num_processes=4,
            device=accel,
        )
    if cropper.det_model is not None and not cropper.det_model.pretrained:
        cropper.det_model.vis_threshold = -1.0
        cropper.det_model.auto_grow = False
        cropper.det_model._cap_warned = True

    warm = bench.make_dataset(8)
    t0 = time.perf_counter()
    cropper.process_dir(warm, warm + "_out", desc=None)
    warmup_s = time.perf_counter() - t0
    log(f"[enhance] e2e compile+warmup: {warmup_s:.1f}s")

    n = int(os.environ.get("FCPT_BENCH_ENH_E2E_N", "32"))
    data = bench.make_dataset(n)
    out = data + "_out"
    t0 = time.perf_counter()
    cropper.process_dir(data, out, desc=None)
    dt = time.perf_counter() - t0
    faces = len(os.listdir(out))
    log(f"[enhance] e2e detect@{size}+gated-SR: {faces} faces from {n} images "
        f"in {dt:.1f}s -> {faces / dt:.2f} faces/s, "
        f"{n * size * size / dt / 1e6:.3f} interim MP/s")
    for d in (warm, warm + "_out", data, out):
        shutil.rmtree(d, ignore_errors=True)
    return {
        "faces_per_s": round(faces / dt, 2),
        "interim_mp_per_s": round(n * size * size / dt / 1e6, 3),
        "images": n,
        # With threshold 1e9 an image gates in iff it has a finite mean face
        # factor, i.e. iff it produced a face; under strategy "largest" that
        # is exactly one crop per gated image, so the crop count IS the
        # gated count (an image with no detection is NOT gated,
        # enhancement.py mean_face_factor → NaN → skipped).
        "gated_images": faces,
        "warmup_s": round(warmup_s, 1),
    }


def run_parse() -> dict:
    import jax

    from face_crop_plus_tpu.models.parsing import BiSeNet
    from face_crop_plus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batch = int(os.environ.get("FCPT_BENCH_PARSE_BATCH", "64"))
    passes = int(os.environ.get("FCPT_BENCH_PASSES", "5"))
    dev = jax.devices()[0]
    model = BiSeNet(
        attr_groups={"glasses": [6]},
        mask_groups={"glasses": [6], "skin": [1]},
        max_batch_size=batch,
        device=dev,
    )
    rng = np.random.default_rng(0)
    faces = rng.integers(0, 255, (batch, 256, 256, 3), np.uint8)
    # Production config-4 path: crops arrive device-resident from the fused
    # detect pipeline (no host->device upload); measure that as the
    # headline, with the standalone host-input path as a secondary figure.
    import jax.numpy as jnp

    faces_dev = jax.device_put(jnp.asarray(faces), dev)

    t0 = time.perf_counter()
    model.predict(faces_dev)
    warmup_s = time.perf_counter() - t0
    log(f"[parse] compile+first: {warmup_s:.1f}s")

    fps_list, host_list = [], []
    for p in range(passes):
        t0 = time.perf_counter()
        model.predict(faces_dev)
        dt = time.perf_counter() - t0
        fps_list.append(round(batch / dt, 1))
        t0 = time.perf_counter()
        model.predict(faces)
        dt_h = time.perf_counter() - t0
        host_list.append(round(batch / dt_h, 1))
        log(f"[parse] pass {p}: device-handoff {fps_list[-1]} faces/s, "
            f"host-input {host_list[-1]} faces/s")

    value = _median(fps_list)
    profile = _parse_device_profile(model, batch)
    base = _ref_baseline().get("bisenet_parse", {}).get("faces_per_s")
    return {
        "metric": "faces parsed/sec/chip (BiSeNet 512² + attr/mask grouping, "
                  "device-resident crops as in the fused pipeline)",
        "value": value,
        "unit": "faces/sec/chip",
        "vs_baseline": round(value / base, 1) if base else None,
        "baseline": {"reference_cpu_faces_per_s": base},
        "method": f"median of {passes} passes, batch {batch}",
        "passes": fps_list,
        "standalone_host_input_faces_per_s": _median(host_list),
        "e2e_process_dir_faces_per_s": _parse_e2e(),
        "warmup_s": round(warmup_s, 1),
        "device_profile": profile,
        "host_contention": host_contention_block(),
    }


def _parse_device_profile(model, batch: int) -> dict | None:
    """Contention-aware profile of the BiSeNet parse program (bit-packed
    masks variant — the one the fused pipeline dispatches)."""
    import bench
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3), np.uint8))
    if model.device is not None:
        imgs = jax.device_put(imgs, model.device)
    mean = tuple(float(v) for v in model.mean)
    std = tuple(float(v) for v in model.std)
    mask_attrs = tuple(tuple(v) for v in (model.mask_groups or {"skin": [1]}).values())

    @jax.jit
    def run(images):
        return model._parse_packed(
            model.params, images, 256, 256, mean, std, mask_attrs, None
        )

    def step(dep):
        _packed, counts = run(imgs + dep)
        return (counts.sum() % 2).astype(jnp.uint8)

    try:
        lowered = run.lower(imgs)
    except Exception:  # pragma: no cover - backend-dependent API
        lowered = None
    return bench.profile_program(
        f"bisenet_parse_packed@512²(batch={batch})", step, batch, "faces",
        lowered=lowered, device=model.device,
    )


def _parse_e2e() -> float | None:
    """Secondary config-4 figure: full ``process_dir`` with masks on disk.

    Detect → crop → parse → attr/mask tree + 0/255 mask rasters, all
    outputs written — the fetch-bound variant (bit-packed device masks +
    parser-handoff packed crop saves shorten the link).  Skipped with
    ``FCPT_BENCH_PARSE_E2E=0``.
    """
    if os.environ.get("FCPT_BENCH_PARSE_E2E", "1") == "0":
        return None
    import bench

    import jax

    platforms = {d.platform for d in jax.devices()}
    accel = "tpu" if "tpu" in platforms else sorted(platforms)[0]
    import warnings

    from face_crop_plus_tpu import Cropper

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cropper = Cropper(
            output_size=bench.OUTPUT,
            resize_size=bench.RESIZE,
            strategy="largest",
            det_threshold=0.6,
            enh_threshold=None,
            attr_groups={"glasses": [6]},
            mask_groups={"glasses": [6], "skin": [1]},
            batch_size=bench.BATCH,
            num_processes=4,
            device=accel,
        )
    if cropper.det_model is not None and not cropper.det_model.pretrained:
        cropper.det_model.vis_threshold = -1.0
        cropper.det_model.auto_grow = False
        cropper.det_model._cap_warned = True

    warm = bench.make_dataset(bench.BATCH)
    cropper.process_dir(warm, warm + "_out", desc=None)
    n = int(os.environ.get("FCPT_BENCH_PARSE_E2E_N", "128"))
    data = bench.make_dataset(n)
    out = data + "_out"
    t0 = time.perf_counter()
    cropper.process_dir(data, out, desc=None)
    dt = time.perf_counter() - t0
    faces = sum(
        1
        for dirpath, _d, files in os.walk(out)
        if not dirpath.endswith("_mask")
        for _f in files
    )
    log(f"[parse] e2e process_dir: {faces} crops (+masks) in {dt:.1f}s "
        f"-> {faces / dt:.1f} faces/s")
    for d in (warm, warm + "_out", data, out):
        shutil.rmtree(d, ignore_errors=True)
    return round(faces / dt, 1)


def run_scale() -> dict:
    """Config 5: 10k-image directory, one e2e pass of the headline pipeline."""
    import bench

    n = int(os.environ.get("FCPT_BENCH_SCALE_N", "10000"))
    os.environ.setdefault("FCPT_BENCH_PASSES", "1")

    import jax

    platforms = {d.platform for d in jax.devices()}
    accel = "tpu" if "tpu" in platforms else sorted(platforms)[0]

    cropper = bench.build_cropper(accel)
    warm_dir = bench.make_dataset(bench.BATCH)
    t0 = time.perf_counter()
    cropper.process_dir(warm_dir, warm_dir + "_out", desc=None)
    warmup_s = time.perf_counter() - t0
    log(f"[scale] compile+warmup: {warmup_s:.1f}s")

    data = bench.make_dataset(n)
    out = data + "_out"
    t0 = time.perf_counter()
    cropper.process_dir(data, out, desc=None)
    dt = time.perf_counter() - t0
    faces = len(os.listdir(out))
    log(f"[scale] {faces} faces from {n} images in {dt:.1f}s")
    log(cropper.stats.report())
    for d in (warm_dir, warm_dir + "_out", data, out):
        shutil.rmtree(d, ignore_errors=True)

    value = round(faces / dt, 2)
    profile = bench.device_profile(cropper)
    base = _ref_baseline().get("detect", {}).get("faces_per_s")
    return {
        "metric": f"faces cropped/sec/chip (e2e {n}-image directory, "
                  "decode+detect@1024+align+crop+encode)",
        "value": value,
        "unit": "faces/sec/chip",
        "vs_baseline": round(value / base, 1) if base else None,
        "baseline": {"reference_cpu_faces_per_s": base},
        "method": f"single e2e pass over {n} images",
        "elapsed_s": round(dt, 1),
        "warmup_s": round(warmup_s, 1),
        "device_profile": profile,
        "host_contention": host_contention_block(),
    }


def run_serving() -> dict:
    """Serving-path bench (VERDICT r4 #7): ``Cropper.process_images`` on a
    resident in-memory batch — no filesystem, no codec.  This is the API a
    serving deployment calls per request batch; the reference has no
    counterpart (its only entry point is the directory pipeline), so
    ``vs_baseline`` uses the reference-CPU detect pipeline denominator,
    labeled as such.
    """
    import bench
    import jax

    platforms = {d.platform for d in jax.devices()}
    accel = "tpu" if "tpu" in platforms else sorted(platforms)[0]
    passes = int(os.environ.get("FCPT_BENCH_PASSES", "5"))
    calls = int(os.environ.get("FCPT_BENCH_SERVING_CALLS", "8"))

    cropper = bench.build_cropper(accel)
    # One resident request batch at the Cropper's device batch size, the
    # shape a serving frontend would pin.  Real face photos: a noise
    # batch detects nothing under real weights and would bench an empty
    # pipeline.
    batch = bench.make_image_batch(bench.BATCH)

    t0 = time.perf_counter()
    crops, indices, _groups = cropper.process_images(batch)
    warmup_s = time.perf_counter() - t0
    log(f"[serving] compile+first: {warmup_s:.1f}s ({len(crops)} crops/call)")

    fps_list = []
    for p in range(passes):
        total = 0
        t0 = time.perf_counter()
        for _ in range(calls):
            crops, _idx, _g = cropper.process_images(batch)
            total += len(crops)
        dt = time.perf_counter() - t0
        fps_list.append(round(total / dt, 1))
        log(f"[serving] pass {p}: {total} crops in {dt:.2f}s "
            f"-> {fps_list[-1]} crops/s (per-call)")

    # Pipelined stream: the serving API's intended steady-state use —
    # `depth` request batches in flight so upload/exec/fetch overlap
    # across requests instead of serializing per call.
    stream_list = []
    for p in range(passes):
        total = 0
        t0 = time.perf_counter()
        for crops, _idx, _g in cropper.process_images_stream(
            (batch for _ in range(calls)), depth=2
        ):
            total += len(crops)
        dt = time.perf_counter() - t0
        stream_list.append(round(total / dt, 1))
        log(f"[serving] pass {p}: {total} crops in {dt:.2f}s "
            f"-> {stream_list[-1]} crops/s (stream, depth 2)")

    # Packed-upload stream (FCPT_SERVE_PACK semantics): detect inputs
    # cross the link as 4:2:0 rows — half the upload bytes on a
    # link-bound deployment; crops still warp from the resident RGB.
    packed_list = []
    for p in range(passes):
        total = 0
        t0 = time.perf_counter()
        for crops, _idx, _g in cropper.process_images_stream(
            (batch for _ in range(calls)), depth=2, pack_upload=True
        ):
            total += len(crops)
        dt = time.perf_counter() - t0
        packed_list.append(round(total / dt, 1))
        log(f"[serving] pass {p}: {total} crops in {dt:.2f}s "
            f"-> {packed_list[-1]} crops/s (stream, packed upload)")

    value = _median(stream_list)
    percall = _median(fps_list)
    profile = bench.device_profile(cropper)
    base = _ref_baseline().get("detect", {}).get("faces_per_s")
    return {
        "metric": "crops/sec/chip (in-memory serving API "
                  "process_images_stream, resident batches of "
                  f"{bench.BATCH}, depth 2)",
        "value": value,
        "unit": "crops/sec/chip",
        "vs_baseline": round(value / base, 1) if base else None,
        "baseline": {
            "reference_cpu_faces_per_s": base,
            "note": "reference has no in-memory API; denominator is its "
                    "directory detect pipeline on this host's CPU",
        },
        "method": f"median of {passes} passes x {calls} calls; "
                  "per-call = blocking process_images, stream = pipelined "
                  "process_images_stream (depth 2)",
        "passes": stream_list,
        "per_call_crops_per_s": percall,
        "per_call_passes": fps_list,
        "packed_stream_crops_per_s": _median(packed_list),
        "packed_stream_passes": packed_list,
        "packed_stream_note": "pack_upload=True: 4:2:0 detect inputs "
                              "(half the upload bytes; crops unchanged, "
                              "detection sees its input's 4:2:0 round "
                              "trip)",
        "warmup_s": round(warmup_s, 1),
        "device_profile": profile,
        "host_contention": host_contention_block(),
    }


def run_mode(mode: str) -> dict:
    if mode == "enhance":
        return run_enhance()
    if mode == "parse":
        return run_parse()
    if mode == "scale":
        return run_scale()
    if mode == "serving":
        return run_serving()
    raise SystemExit(f"unknown FCPT_BENCH_MODE: {mode}")


if __name__ == "__main__":
    print(json.dumps(run_mode(os.environ.get("FCPT_BENCH_MODE", sys.argv[-1]))))
