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
# (3: native host warp landed, r3; 4: AVX2 fixed-point warp default;
# 5: YUV-direct landmark crops, r5).
CACHE_KEY = json.loads(json.dumps([RESIZE, OUTPUT, BATCH, SRC_HW, 5]))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_image_batch(n: int) -> np.ndarray:
    """(n, *SRC_HW, 3) uint8 batch of CelebA-sized face photos in memory.

    Demo-derived, same sources as :func:`make_dataset` — serving-path
    benches must feed real faces (a noise batch detects nothing under
    real weights and would measure an empty pipeline).
    """
    from face_crop_plus_tpu.utils.io import imread_rgb

    base = []
    if os.path.isdir(DEMO_DIR):
        for f in sorted(os.listdir(DEMO_DIR)):
            img = imread_rgb(os.path.join(DEMO_DIR, f))
            if img is not None:
                try:
                    import cv2

                    img = cv2.resize(
                        img, (SRC_HW[1], SRC_HW[0]), interpolation=cv2.INTER_AREA
                    )
                except Exception:  # pragma: no cover
                    from PIL import Image

                    img = np.asarray(
                        Image.fromarray(img).resize(
                            (SRC_HW[1], SRC_HW[0]), Image.BOX
                        )
                    )
                base.append(img)
    if not base:  # pragma: no cover - demo images always ship
        rng = np.random.default_rng(0)
        base = [
            rng.integers(0, 255, SRC_HW + (3,), dtype=np.uint8)
            for _ in range(8)
        ]
    return np.stack([base[i % len(base)] for i in range(n)])


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
    t_init0 = time.perf_counter()
    if MODE == "landmarks":
        cropper = build_cropper(device_str, landmarks=_write_landmarks(n_images))
    else:
        cropper = build_cropper(device_str)
    init_s = time.perf_counter() - t_init0

    # Warm with one full device batch (landmarks mode batches at 64, not
    # BATCH) so the timed passes never compile.
    warm_dir = make_dataset(64 if MODE == "landmarks" else BATCH)
    out_warm = warm_dir + "_out"
    t0 = time.perf_counter()
    cropper.process_dir(warm_dir, out_warm, desc=None)
    warmup_s = time.perf_counter() - t0
    if COMPILE_STATS["warmup_s"] is None:
        COMPILE_STATS["warmup_s"] = round(warmup_s, 1)
        # Attribute the cold start (VERDICT r4 #2): Cropper construction
        # (weights + upload), backend XLA compile (counted by the
        # monitoring listener), and the per-process session establishment
        # the pre-warm thread paid in the background (overlapped with the
        # rest; tools/session_probe.py shows it is the whole mystery cost).
        from face_crop_plus_tpu.utils.prewarm import establishment_seconds

        est = establishment_seconds(timeout=1.0)
        COMPILE_STATS["warmup_split"] = {
            "cropper_init_s": round(init_s, 1),
            "backend_compile_s": round(COMPILE_STATS["backend_s"], 1),
            "first_pass_s": round(warmup_s, 1),
            # prewarm reports -1.0 for "errored or interrupted" — that is
            # a status, not a duration; artifacts carry null + a flag.
            "session_establishment_s": (
                round(est, 1) if est is not None and est >= 0 else None
            ),
            **(
                {"session_establishment_failed": True}
                if est is not None and est < 0
                else {}
            ),
            "note": "establishment overlaps init/compile via utils/prewarm",
        }
    log(f"[{device_str}] compile+warmup batch: {warmup_s:.1f}s "
        f"({COMPILE_STATS['programs']} programs, "
        f"{COMPILE_STATS['backend_s']:.1f}s backend compile, "
        f"cropper init {init_s:.1f}s, session est "
        f"{COMPILE_STATS.get('warmup_split', {}).get('session_establishment_s')}s)")

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


def _measure_rtt_ms(samples: int = 5, device=None) -> float:
    """Median dispatch+fetch round-trip of a trivial program (fresh tiny
    output buffer each time — the fixed per-fetch cost of this tunneled
    environment, ~10 ms here vs ~0 on a directly-attached chip).

    ``device`` pins the probe to the chip the profiled program runs on —
    on a multi-device host the default device may be a different chip
    whose RTT/contention say nothing about the program's.
    """
    import jax
    import jax.numpy as jnp

    tick = jax.jit(lambda i: i + 1)
    seed = jnp.int32(0)
    if device is not None:
        seed = jax.device_put(seed, device)
    i = tick(seed)
    int(i)  # warm (compile + first fetch)
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        i = tick(i)
        int(i)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]


def _make_contention_probe(device=None):
    """Fixed-work compute probe: a chained 2048³ bf16 matmul loop.

    ~4.4 TF per call — compute-dominated (tens of ms) so the tunnel RTT
    is a small correction, unlike an e2e pass whose host stages mask chip
    time-sharing.  Returns (probe_step, flops): ``probe_step(x) -> x`` is
    chain-dispatchable.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((2048, 2048)), jnp.bfloat16)
    if device is not None:
        a = jax.device_put(a, device)
    steps = 256

    @jax.jit
    def probe_step(x):
        return lax.fori_loop(0, steps, lambda i, y: y @ a, x)

    flops = steps * 2 * 2048**3
    return probe_step, float(flops)


def profile_program(
    label: str,
    step,
    items: float,
    items_unit: str,
    lowered=None,
    groups: int | None = None,
    chain: int | None = None,
    device=None,
) -> dict | None:
    """Contention-aware device profile of one compiled program.

    VERDICT r4 #1: a single averaged measurement cannot distinguish program
    cost from chip time-sharing on this shared-TPU host (the r4 driver run
    measured the detect program 2x slower than calm-window runs of the same
    build).  This profiler (a) measures ``groups`` separate groups of
    ``chain`` chained dispatches and reports the min (uncontended estimate)
    *and* the median, and (b) interleaves a fixed-work matmul probe between
    groups whose min/median ratio is a chip-contention index recorded in
    the artifact — so a reader can tell "slow program" from "busy chip"
    without rerunning.

    Args:
        step: ``step(dep) -> dep`` — dispatches the program once with an
            input depending on ``dep`` and returns a small device array
            depending on the output (chained-dependency discipline: on this
            platform unread duplicate dispatches are skipped, so only a
            chain forces every program to really execute;
            see tools/detect_traffic.py).
        items: items per dispatch (images, faces, megapixels...).
        lowered: a ``jax`` lowered object for ``cost_analysis`` (optional).
    """
    import jax

    groups = groups or int(os.environ.get("FCPT_PROFILE_GROUPS", "6"))
    chain = chain or int(os.environ.get("FCPT_PROFILE_CHAIN", "4"))

    flops = nbytes = None
    if lowered is not None:
        try:
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            flops = float(ca.get("flops", 0.0))
            nbytes = float(ca.get("bytes accessed", 0.0))
        except Exception as e:  # pragma: no cover - backend-dependent API
            log(f"cost_analysis unavailable: {e}")

    rtt_ms = _measure_rtt_ms(device=device)
    probe_step, probe_flops = _make_contention_probe(device=device)

    import jax.numpy as jnp

    x = jnp.zeros((2048, 2048), jnp.bfloat16)
    if device is not None:
        x = jax.device_put(x, device)
    x = probe_step(x)
    np.asarray(x[0, 0])  # warm probe
    dep = step(jnp.uint8(0))
    np.asarray(dep)  # warm program (compile + fresh-shape fetch)
    for _ in range(chain):  # burn-in group: the first chained group after
        dep = step(dep)     # warmup still pays one-time server costs
    np.asarray(dep)

    prog_ms, probe_ms = [], []
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(chain):
            dep = step(dep)
        np.asarray(dep)
        # Same 0.1 ms floor as the probe: the rtt correction is a single
        # pre-run median and on a contended tunnel can exceed a light
        # program's whole group elapsed — a 0.0 here would zero exec_min
        # and blow up every per-time derived stat below.
        prog_ms.append(
            max(0.1, (time.perf_counter() - t0) * 1e3 - rtt_ms) / chain
        )

        t0 = time.perf_counter()
        x = probe_step(x)
        np.asarray(x[0, 0])
        probe_ms.append(max(0.1, (time.perf_counter() - t0) * 1e3 - rtt_ms))

    from statistics import median as med

    exec_min, exec_med = min(prog_ms) / 1e3, med(prog_ms) / 1e3
    peaks = _chip_peaks()
    peak, peak_bw = peaks if peaks else (None, None)
    prof = {
        "program": label,
        "batch_items": items,
        "items_unit": items_unit,
        "program_gflops": round(flops / 1e9, 1) if flops else None,
        "program_gbytes": round(nbytes / 1e9, 1) if nbytes else None,
        # min over groups = the uncontended-program estimate; median = what
        # a typical dispatch costs in *this* run's contention weather.
        "device_exec_s": round(exec_min, 4),
        "device_exec_median_s": round(exec_med, 4),
        "exec_ms_groups": [round(v, 1) for v in prog_ms],
        "achieved_tflops": round(flops / exec_min / 1e12, 2) if flops else None,
        "mfu": round(flops / exec_min / peak, 4) if flops and peak else None,
        # The conv programs are memory-bound: cost_analysis bytes / peak HBM
        # BW is the roofline time (an upper bound on traffic — XLA fusion
        # reduces the real number), so bw_roofline_frac near/above 1 means
        # the program runs at the bandwidth speed-of-light and MFU is the
        # wrong lens.
        "bw_roofline_frac": (
            round((nbytes / peak_bw) / exec_min, 2) if nbytes and peak_bw else None
        ),
        "bw_roofline_frac_median": (
            round((nbytes / peak_bw) / exec_med, 2) if nbytes and peak_bw else None
        ),
        "contention": {
            # Fixed-work probe: same device work every group, so any spread
            # is the chip/tunnel, not the program.  index = median/min;
            # ~1.0 means a calm chip (trust the medians), >>1 means
            # time-shared (trust the mins).
            "index": round(med(probe_ms) / min(probe_ms), 2),
            "probe_ms_groups": [round(v, 1) for v in probe_ms],
            "probe_min_tflops": round(probe_flops / (min(probe_ms) / 1e3) / 1e12, 1),
            "rtt_ms": round(rtt_ms, 1),
        },
        "peak_tflops_assumed": round(peak / 1e12) if peak else None,
        "peak_hbm_gbs_assumed": round(peak_bw / 1e9) if peak_bw else None,
        "device_items_per_s": round(items / exec_min, 1),
        "device_items_per_s_median": round(items / exec_med, 1),
    }
    log(f"device profile: {prof}")
    return prof


def device_profile(cropper) -> dict | None:
    """Contention-aware profile of the fused detect-path program.

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
        lowered = program.lower(fp, det.params, imgs, ih, iw, **kw)
    except Exception as e:  # pragma: no cover - backend-dependent API
        log(f"lowering unavailable: {e}")
        lowered = None

    @jax.jit
    def _chain(images, dep):
        return images + dep

    def step(dep):
        out = program(fp, det.params, _chain(imgs, dep), ih, iw, **kw)
        caps = out[2] if host_crop else out[3]
        return (caps.sum() % 2).astype(jnp.uint8)

    prof = profile_program(
        "detect_only(host-crop)" if host_crop else "detect+warp",
        step,
        BATCH,
        "images",
        lowered=lowered,
        device=fp.device,
    )
    if prof is not None:
        # Back-compat alias used by earlier rounds' tables.
        prof["device_faces_per_s"] = prof["device_items_per_s"]
    return prof


def host_profile_landmarks(e2e_value: float | None) -> dict | None:
    """Host-side analog of the device profile for the landmark-only config.

    The config runs no models — decode, similarity fit, native warp and
    encode are all host work — so the efficiency denominator is a *host*
    roofline (VERDICT r4 #4): each stage's standalone throughput ceiling is
    measured with the exact production kernels on this box, combined into
    the serial roofline 1/(Σ 1/stage) (on a 1-vCPU host CPU-bound stages
    cannot overlap), and the e2e number is reported as a fraction of it.
    """
    try:
        from face_crop_plus_tpu.ops.transform import estimate_similarity_np
        from face_crop_plus_tpu.utils.io import (
            PackedYUVImage,
            imwrite,
            imwrite_yuv420,
            read_images,
        )
        from face_crop_plus_tpu.utils.landmarks import make_target_landmarks
        from face_crop_plus_tpu.utils.native_io import (
            warp_affine_batch_native,
            warp_yuv420_available,
            warp_yuv420_batch_native,
            yuv_encoder_available,
        )

        n, reps = 64, 3
        d = make_dataset(n)
        files = sorted(os.listdir(d))

        # r5: the production landmark pipeline runs YUV-direct for
        # JPEG-in/JPEG-out (see Cropper._yuv_crop_eligible) — profile the
        # kernels the e2e number actually runs.
        yuv = (
            os.environ.get("FCPT_YUV_CROP", "auto") != "0"
            and os.environ.get("FCPT_WARP_EXACT") != "1"
            and warp_yuv420_available()
            and yuv_encoder_available()
        )

        imgs, _names = read_images(files, d, want_packed=yuv)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            imgs, _names = read_images(files, d, want_packed=yuv)
        dec_ips = n * reps / (time.perf_counter() - t0)
        yuv = yuv and all(isinstance(im, PackedYUVImage) for im in imgs)

        # The production fit+warp: numpy-twin similarity estimate to the
        # standard 5-point template, then the native fixed-point AVX2 warp
        # — per YCbCr plane in YUV-direct mode, RGB otherwise
        # (FCPT_WARP_EXACT=1 changes the sampling, so honor it).
        base = np.array(
            [[69, 112], [108, 112], [88, 134], [72, 154], [104, 154]], np.float32
        )
        src = np.broadcast_to(base, (n, 5, 2))
        tgt = make_target_landmarks(OUTPUT, 0.65)
        exact = os.environ.get("FCPT_WARP_EXACT", "0") == "1"
        idx = np.arange(n, dtype=np.int32)
        if yuv:
            batch = np.stack([im.packed for im in imgs])
            src_hw = (imgs[0].h, imgs[0].w)

            def _warp(mats):
                return warp_yuv420_batch_native(
                    batch, src_hw, mats, idx, OUTPUT, exact=exact
                )

        else:
            batch = np.stack(imgs)

            def _warp(mats):
                return warp_affine_batch_native(
                    batch, mats, idx, OUTPUT, exact=exact
                )

        mats, _valid = estimate_similarity_np(src, tgt)
        crops = _warp(mats)
        if crops is None:
            return None
        t0 = time.perf_counter()
        for _ in range(reps):
            mats, _valid = estimate_similarity_np(src, tgt)
            crops = _warp(mats)
        warp_ips = n * reps / (time.perf_counter() - t0)

        enc_dir = tempfile.mkdtemp(prefix="fcpt_benchenc_")

        def _encode(path, crop):
            if yuv:
                return imwrite_yuv420(path, crop, OUTPUT)
            return imwrite(path, crop)

        _encode(os.path.join(enc_dir, "warm.jpg"), crops[0])
        t0 = time.perf_counter()
        for r in range(reps):
            for i in range(n):
                _encode(os.path.join(enc_dir, f"{r}_{i}.jpg"), crops[i])
        enc_ips = n * reps / (time.perf_counter() - t0)
        shutil.rmtree(enc_dir, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)

        roofline = 1.0 / (1.0 / dec_ips + 1.0 / warp_ips + 1.0 / enc_ips)
        prof = {
            "stage_ceilings_items_per_s": {
                "decode": round(dec_ips, 1),
                "fit+warp": round(warp_ips, 1),
                "encode": round(enc_ips, 1),
            },
            "serial_roofline_faces_per_s": round(roofline, 1),
            "roofline_frac": (
                round(e2e_value / roofline, 2) if e2e_value else None
            ),
            "cpus": os.cpu_count(),
            "path": "yuv-direct" if yuv else "rgb",
            "note": "ceilings measured standalone with the production "
                    "kernels (native decode / numpy fit + AVX2 warp / "
                    "encode — packed 4:2:0 end to end on the yuv-direct "
                    "path); serial roofline assumes no stage overlap "
                    "(1-vCPU-accurate; more cores raise it)",
        }
        log(f"host profile: {prof}")
        return prof
    except Exception as e:  # pragma: no cover - environment-dependent
        log(f"host profile unavailable: {e}")
        return None


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

    # Start session establishment NOW so it overlaps dataset creation,
    # baseline loading and Cropper construction (utils/prewarm.py; the
    # Cropper also starts it, but the earlier the better).  Landmarks mode
    # is pure-host: no program output is ever fetched, so establishing a
    # session would only contend with other users of the shared chip.
    if accel != "cpu" and MODE != "landmarks":
        from face_crop_plus_tpu.utils.prewarm import start as _prewarm_start

        _prewarm_start(next(d for d in devices if d.platform == accel))

    if MODE not in ("detect", "landmarks"):
        from tools.bench_configs import run_mode

        print(json.dumps(run_mode(MODE)))
        return

    profile = host_prof = None
    if accel == "cpu":
        value = measure("cpu", n_images=32)
        value_passes = getattr(measure, "last_passes", None)
        same_pipeline_cpu = value
        if MODE == "landmarks":
            host_prof = host_profile_landmarks(value)
    else:
        n = 1024 if MODE == "landmarks" else 256
        value = measure(accel, n_images=n)
        # Snapshot before cpu_baseline() runs measure() again and overwrites
        # the per-pass list with the CPU baseline's.
        value_passes = getattr(measure, "last_passes", None)
        if MODE == "detect":
            profile = device_profile(getattr(measure, "last_cropper", None))
        elif MODE == "landmarks":
            host_prof = host_profile_landmarks(value)
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

    # Host-slowdown fingerprint vs the baseline-capture window (the host
    # analog of the device contention index; see bench_configs).
    host_cont = None
    try:
        from tools.bench_configs import host_contention_block

        host_cont = host_contention_block(ref_data if ref_cpu else None)
    except Exception as e:
        log(f"host contention probe unavailable: {e}")

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
                **(
                    {"warmup_split": COMPILE_STATS["warmup_split"]}
                    if "warmup_split" in COMPILE_STATS
                    else {}
                ),
                "compiled_programs": COMPILE_STATS["programs"],
                "backend_compile_s": round(COMPILE_STATS["backend_s"], 1),
                "device_profile": profile,
                **({"host_profile": host_prof} if host_prof else {}),
                **(
                    {"host_contention": host_cont} if host_cont else {}
                ),
                **({"backend_error": backend_error} if backend_error else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
