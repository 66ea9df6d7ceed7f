"""Headline benchmark: faces cropped/sec/chip, end-to-end process_dir.

Measures the real user-facing pipeline (BASELINE.json configs 2/5): a
CelebA-style directory of JPEG files is processed end to end — native JPEG
decode → fused device program (resize+pad → RetinaFace detection at 1024² →
NMS/strategy → similarity fit → warp crop) → JPEG encode — and throughput is
faces/sec wall-clock.  Uniform small sources exercise the upload-optimal
path: raw pixels go up at source resolution and are brought to detector
resolution on device.

``vs_baseline`` is the same pipeline measured on the host CPU backend (the
reference publishes no numbers — BASELINE.md mandates a measured
denominator); the CPU figure is cached in ``.bench_cpu.json``.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "faces/sec/chip", "vs_baseline": N}
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESIZE = (1024, 1024)   # detector resolution (reference default)
OUTPUT = (256, 256)
BATCH = int(os.environ.get("FCPT_BENCH_BATCH", "16"))
SRC_HW = (218, 178)     # CelebA-style source size
CPU_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu.json")
DEMO_DIR = "/root/reference/demo/input_images"
# json-normalized (tuples -> lists) so it compares equal after a round trip;
# the final int is a config version — bump when CPU-path behavior changes
# (3: native host warp landed, r3; 4: AVX2 fixed-point warp default).
CACHE_KEY = json.loads(json.dumps([RESIZE, OUTPUT, BATCH, SRC_HW, 4]))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_dataset(n: int) -> str:
    """Creates a temp directory with n CelebA-sized JPEGs."""
    from face_crop_plus_tpu.utils.io import imread_rgb, imwrite

    try:
        import cv2

        def resize(img):
            return cv2.resize(img, (SRC_HW[1], SRC_HW[0]), interpolation=cv2.INTER_AREA)

    except Exception:  # pragma: no cover
        from PIL import Image

        def resize(img):
            return np.asarray(
                Image.fromarray(img).resize((SRC_HW[1], SRC_HW[0]), Image.BOX)
            )

    base = []
    if os.path.isdir(DEMO_DIR):
        for f in sorted(os.listdir(DEMO_DIR)):
            img = imread_rgb(os.path.join(DEMO_DIR, f))
            if img is not None:
                base.append(resize(img))
    if not base:
        rng = np.random.default_rng(0)
        base = [rng.integers(0, 255, SRC_HW + (3,), dtype=np.uint8) for _ in range(8)]

    d = tempfile.mkdtemp(prefix="fcpt_bench_")
    for i in range(n):
        imwrite(os.path.join(d, f"{i:06d}.jpg"), base[i % len(base)])
    return d


MODE = os.environ.get("FCPT_BENCH_MODE", "detect")  # detect|landmarks|enhance|parse|scale

#: Compilation accounting (VERDICT r2 #1): every backend compile this
#: process performs is counted and timed via jax.monitoring, and the
#: warmup pass is reported separately in the output JSON.
COMPILE_STATS = {"programs": 0, "backend_s": 0.0, "warmup_s": None}


def _install_compile_listener():
    try:
        from jax import monitoring

        def _on_event(event, duration, **kw):
            if event == "/jax/core/compile/backend_compile_duration":
                COMPILE_STATS["programs"] += 1
                COMPILE_STATS["backend_s"] += duration

        monitoring.register_event_duration_secs_listener(_on_event)
    except Exception:  # pragma: no cover
        pass


def _write_landmarks(max_n: int) -> str:
    """CelebA-style landmarks file covering the synthetic naming pattern."""
    path = os.path.join(tempfile.gettempdir(), "fcpt_bench_landmarks.txt")
    base = [69, 112, 108, 112, 88, 134, 72, 154, 104, 154]  # CelebA-ish
    with open(path, "w") as f:
        for i in range(max_n):
            f.write(f"{i:06d}.jpg " + " ".join(str(v) for v in base) + "\n")
    return path


def _bench_workers(device_str: str, landmarks: str | None) -> int:
    """Worker threads for the bench Cropper.

    Device pipelines want several workers (they mostly wait on the chip);
    the pure-host landmark pipeline is CPU-bound, so oversubscribing the
    host cores thrashes (measured on a 1-vCPU host: 4 workers 425 faces/s
    vs 1-2 workers ~620).  FCPT_BENCH_WORKERS overrides.
    """
    env = os.environ.get("FCPT_BENCH_WORKERS")
    if env:
        return int(env)
    if landmarks is not None:
        return max(1, min(4, os.cpu_count() or 1))
    return 4 if device_str != "cpu" else 2


def build_cropper(device_str: str, landmarks: str | None = None):
    import warnings

    from face_crop_plus_tpu import Cropper

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cropper = Cropper(
            output_size=OUTPUT,
            resize_size=RESIZE,
            strategy="largest",
            det_threshold=0.6 if landmarks is None else None,
            enh_threshold=None,
            landmarks=landmarks,
            batch_size=BATCH if landmarks is None else 64,
            num_processes=_bench_workers(device_str, landmarks),
            device=device_str,
        )
    if cropper.det_model is not None and not cropper.det_model.pretrained:
        # Random weights leave no score above 0.6; vis=-1 keeps exactly one
        # face per image (strategy largest) — the realistic CelebA workload.
        # With every anchor above threshold, pre_topk always "binds", so cap
        # growth must stay off (it exists for real crowd images).  With real
        # checkpoints in the cache the detector keeps its production
        # thresholds, so the bench measures the true candidate-count regime.
        cropper.det_model.vis_threshold = -1.0
        cropper.det_model.auto_grow = False
        cropper.det_model._cap_warned = True
    return cropper


def measure(device_str: str, n_images: int) -> float:
    if MODE == "landmarks":
        cropper = build_cropper(device_str, landmarks=_write_landmarks(n_images))
    else:
        cropper = build_cropper(device_str)

    # Warm with one full device batch (landmarks mode batches at 64, not
    # BATCH) so the timed passes never compile.
    warm_dir = make_dataset(64 if MODE == "landmarks" else BATCH)
    out_warm = warm_dir + "_out"
    t0 = time.perf_counter()
    cropper.process_dir(warm_dir, out_warm, desc=None)
    warmup_s = time.perf_counter() - t0
    if COMPILE_STATS["warmup_s"] is None:
        COMPILE_STATS["warmup_s"] = round(warmup_s, 1)
    log(f"[{device_str}] compile+warmup batch: {warmup_s:.1f}s "
        f"({COMPILE_STATS['programs']} programs, "
        f"{COMPILE_STATS['backend_s']:.1f}s backend compile)")

    data_dir = make_dataset(n_images)
    out_dir = data_dir + "_out"
    passes = max(
        1, int(os.environ.get("FCPT_BENCH_PASSES", "5" if device_str != "cpu" else "1"))
    )
    fps_list = []
    prev = {k: dict(v) for k, v in cropper.stats.as_dict().items()}
    for p in range(passes):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        cropper.process_dir(data_dir, out_dir, desc=None)
        dt = time.perf_counter() - t0
        faces = len(os.listdir(out_dir))
        fps_list.append(round(faces / dt, 2))
        cur = {k: dict(v) for k, v in cropper.stats.as_dict().items()}
        stages = "  ".join(
            f"{k}={cur[k]['seconds'] - prev.get(k, {}).get('seconds', 0.0):.2f}s"
            for k in sorted(cur)
        )
        prev = cur
        log(f"[{device_str}] pass {p}: {faces} faces in {dt:.2f}s "
            f"-> {faces / dt:.2f} faces/s (e2e)  [{stages}]")
    log(cropper.stats.report())

    for d in (warm_dir, out_warm, data_dir, out_dir):
        shutil.rmtree(d, ignore_errors=True)
    # Median of N: robust to time-shared-chip noise in either direction
    # (best-of-N masked a degrading trend in round 1; see STATUS.md).
    ordered = sorted(fps_list)
    fps = ordered[passes // 2] if passes % 2 else (
        (ordered[passes // 2 - 1] + ordered[passes // 2]) / 2)
    measure.last_passes = fps_list
    measure.last_cropper = cropper
    return fps


def _chip_peaks() -> tuple[float, float] | None:
    """(peak bf16 FLOP/s, peak HBM bytes/s) of the attached TPU (public)."""
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    table = [
        ("v5 lite", (394e12, 819e9)), ("v5litepod", (394e12, 819e9)),
        ("v5e", (394e12, 819e9)), ("v5p", (459e12, 2765e9)),
        ("v6e", (918e12, 1640e9)), ("v6", (918e12, 1640e9)),
        ("v4", (275e12, 1228e9)), ("v3", (123e12, 900e9)),
        ("v2", (45e12, 700e9)),
    ]
    for key, val in table:
        if key in kind:
            return val
    return None


def peak_flops_per_s() -> float | None:
    peaks = _chip_peaks()
    return peaks[0] if peaks else None


def device_profile(cropper) -> dict | None:
    """FLOPs / device-exec time / MFU of the fused detect-path program.

    ``cost_analysis()`` gives the compiled program's FLOP count; device
    execution time is measured with the chained-dependency discipline
    (tools/detect_traffic.py): each dispatch's input depends on the
    previous dispatch's output, and only the final host fetch is the
    barrier.  Merely re-dispatching identical args and fetching the last
    output — the r3 method — under-measured ~2x on this platform (unread
    duplicate dispatches are skipped/deduped), overstating the device
    ceiling; chaining forces every program to really execute.
    MFU is vs the chip's public peak (detection is conv/matmul-dominated).

    Under the host-crop execution mode the profiled program is the
    detect-only one (crops are host work); otherwise the single-dispatch
    detect+warp program.
    """
    import jax
    import jax.numpy as jnp

    fp = getattr(cropper, "_fused", None)
    if fp is None:
        return None
    det = fp.det
    host_crop = (
        cropper.enh_model is None
        and cropper.par_model is None
        and cropper._host_crop_enabled()
    )
    program = type(fp)._run_detect if host_crop else type(fp)._run
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (BATCH,) + SRC_HW + (3,), np.uint8))
    if fp.device is not None:
        imgs = jax.device_put(imgs, fp.device)
    kw = det._detect_args()
    ih, iw = RESIZE[1], RESIZE[0]
    try:
        # Access through the class: the jit wrapper's ``lower`` does not
        # survive instance binding, so pass ``fp`` explicitly.
        compiled = program.lower(fp, det.params, imgs, ih, iw, **kw).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover - backend-dependent API
        log(f"cost_analysis unavailable: {e}")
        return None

    @jax.jit
    def _chain(images, dep):
        return images + dep

    def run(images):
        out = program(fp, det.params, images, ih, iw, **kw)
        caps = out[2] if host_crop else out[3]
        return (caps.sum() % 2).astype(jnp.uint8)

    dep = run(imgs)
    np.asarray(dep)  # fetch: on tunneled backends only a host read syncs
    k = 10
    t0 = time.perf_counter()
    for _ in range(k):
        dep = run(_chain(imgs, dep))
    np.asarray(dep)
    exec_s = (time.perf_counter() - t0) / k

    peaks = _chip_peaks()
    peak, peak_bw = peaks if peaks else (None, None)
    prof = {
        "program": "detect_only(host-crop)" if host_crop else "detect+warp",
        "batch": BATCH,
        "program_gflops": round(flops / 1e9, 1),
        "program_gbytes": round(nbytes / 1e9, 1),
        "device_exec_s": round(exec_s, 4),
        "achieved_tflops": round(flops / exec_s / 1e12, 2),
        "mfu": round(flops / exec_s / peak, 4) if peak else None,
        # The detect program is memory-bound: cost_analysis bytes / peak HBM
        # BW is its roofline time (an upper bound on traffic — XLA fusion
        # reduces the real number), so bw_roofline_frac near/above 1 means
        # the program runs at the bandwidth speed-of-light, and MFU is the
        # wrong lens (measured r3: ~0.8 of nominal-bytes roofline, 13% MFU).
        "bw_roofline_frac": (
            round((nbytes / peak_bw) / exec_s, 2) if peak_bw and exec_s else None
        ),
        "peak_tflops_assumed": round(peak / 1e12) if peak else None,
        "peak_hbm_gbs_assumed": round(peak_bw / 1e9) if peak_bw else None,
        "device_faces_per_s": round(BATCH / exec_s, 1),
    }
    log(f"device profile: {prof}")
    return prof


def cpu_baseline() -> float:
    if os.path.isfile(CPU_CACHE):
        with open(CPU_CACHE) as f:
            cached = json.load(f)
        if cached.get("config") == CACHE_KEY:
            log(f"[cpu] cached baseline: {cached['fps']:.3f} faces/s")
            return cached["fps"]
    fps = measure("cpu", n_images=16)
    try:
        with open(CPU_CACHE, "w") as f:
            json.dump({"config": CACHE_KEY, "fps": fps}, f)
    except OSError:
        pass
    return fps


def _devices_with_retry(attempts: int = 2, wait_s: float = 45.0):
    """jax.devices() with backoff: tunneled TPU backends fail transiently.

    A flaky backend at bench time must not turn the round's artifact into
    a traceback — retry, then fall back to the CPU backend with the
    failure recorded (the JSON stays parseable and honestly labeled).
    """
    import jax

    last = None
    for i in range(attempts):
        try:
            return jax.devices(), None
        except RuntimeError as e:  # backend init failure (Unavailable etc.)
            last = e
            log(f"backend init failed (attempt {i + 1}/{attempts}): {e}")
            if i + 1 < attempts:
                time.sleep(wait_s)
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return jax.devices("cpu"), f"accelerator backend unavailable: {last}"


def main():
    _install_compile_listener()

    devices, backend_error = _devices_with_retry()
    platforms = {d.platform for d in devices}
    accel = "tpu" if "tpu" in platforms else sorted(platforms)[0]
    log(f"devices: {devices}")

    if MODE not in ("detect", "landmarks"):
        from tools.bench_configs import run_mode

        print(json.dumps(run_mode(MODE)))
        return

    profile = None
    if accel == "cpu":
        value = measure("cpu", n_images=32)
        value_passes = getattr(measure, "last_passes", None)
        same_pipeline_cpu = value
    else:
        n = 1024 if MODE == "landmarks" else 256
        value = measure(accel, n_images=n)
        # Snapshot before cpu_baseline() runs measure() again and overwrites
        # the per-pass list with the CPU baseline's.
        value_passes = getattr(measure, "last_passes", None)
        if MODE == "detect":
            profile = device_profile(getattr(measure, "last_cropper", None))
        same_pipeline_cpu = cpu_baseline() if MODE == "detect" else None

    # The BASELINE.md-mandated denominator: the *executing reference* library
    # measured on this machine's CPU (tools/ref_baseline.py, cached).
    ref_cpu = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import ref_baseline

        ref_data = ref_baseline.run()
        ref_cpu = (
            ref_data.get("detect", {}).get("faces_per_s")
            if MODE == "detect"
            else ref_data.get("landmarks_e2e", {}).get("faces_per_s")
        )
    except Exception as e:
        log(f"reference baseline unavailable: {e}")

    base = ref_cpu or same_pipeline_cpu
    metric = (
        "faces cropped/sec/chip (e2e decode+detect@1024+align+crop+encode)"
        if MODE == "detect"
        else "faces cropped/sec/chip (e2e, precomputed landmarks, no models)"
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": "faces/sec/chip",
                "vs_baseline": round(value / base, 2) if base else None,
                "baseline": {
                    "reference_cpu_faces_per_s": ref_cpu,
                    "same_pipeline_cpu_faces_per_s": same_pipeline_cpu,
                    "denominator": "reference_cpu" if ref_cpu else "same_pipeline_cpu",
                },
                "method": "median of N e2e passes",
                "passes": value_passes,
                "warmup_s": COMPILE_STATS["warmup_s"],
                "compiled_programs": COMPILE_STATS["programs"],
                "backend_compile_s": round(COMPILE_STATS["backend_s"], 1),
                "device_profile": profile,
                **({"backend_error": backend_error} if backend_error else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
