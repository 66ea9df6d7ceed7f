"""Measures the *executing reference* (`/root/reference`) on CPU.

BASELINE.md mandates that performance claims use a **measured** reference
denominator ("the CPU denominator must be measured by running the reference
configurations").  This tool runs the actual reference library — not our
framework on the CPU backend — for every BASELINE.json config that can run
in this environment, and caches the numbers in ``.bench_ref_cpu.json`` for
``bench.py`` / ``tools/bench_configs.py`` to report as ``vs_baseline``.

What runs (all on the reference's own code paths):

* config 1 — landmark-only e2e: the reference ``Cropper.process_dir`` with a
  precomputed-landmarks file (no models; ``cropper.py:748-850``).
* config 2 — detection: the reference ``RetinaFace.predict`` (with the
  faithful vendored ResNet-50 backbone from ``tests/refcompat.py``) plus
  ``as_batch`` and ``crop_align``, i.e. the reference's detect+align+crop
  hot path on the same CelebA-sized synthetic dataset the headline bench
  uses.  Random weights leave no score above a real threshold, so the
  visibility threshold is set to the score quantile that admits ~256
  candidates/image — the candidate count a real-weights run produces and
  the same budget our pre_topk=256 grants.
* config 3 — SR: the reference ``RRDBNet`` forward + bicubic-undo per
  megapixel (``rrdb.py:64-81``), at 256² (per-MP cost is size-invariant;
  512² on CPU takes minutes for no extra information).
* config 4 — parsing: the reference ``BiSeNet`` forward + argmax at its
  fixed 512² inference size (``bise.py:195-212,389-394``).

Usage: ``python tools/ref_baseline.py [--force]`` — prints the JSON dict.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

CACHE = os.path.join(_REPO, ".bench_ref_cpu.json")
VERSION = 1


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _dataset(n: int, hw=(218, 178)) -> str:
    """CelebA-sized JPEG directory (same construction as bench.make_dataset)."""
    import cv2

    base = []
    demo = "/root/reference/demo/input_images"
    for f in sorted(os.listdir(demo)):
        img = cv2.imread(os.path.join(demo, f))
        if img is not None:
            base.append(cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_AREA))
    d = tempfile.mkdtemp(prefix="fcpt_refbase_")
    for i in range(n):
        cv2.imwrite(os.path.join(d, f"{i:06d}.jpg"), base[i % len(base)])
    return d


def _landmarks_file(n: int) -> str:
    path = os.path.join(tempfile.gettempdir(), "fcpt_refbase_landmarks.txt")
    base = [69, 112, 108, 112, 88, 134, 72, 154, 104, 154]
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"{i:06d}.jpg " + " ".join(str(v) for v in base) + "\n")
    return path


def measure_landmarks_e2e(n: int = 256) -> dict:
    """Config 1: reference Cropper, precomputed landmarks, no models."""
    import warnings

    from refcompat import import_reference

    import_reference()
    from face_crop_plus import Cropper

    data = _dataset(n)
    out = data + "_out"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cropper = Cropper(
            output_size=(256, 256),
            strategy="largest",
            det_threshold=None,
            enh_threshold=None,
            landmarks=_landmarks_file(n),
            batch_size=64,
            num_processes=4,
            device="cpu",
        )
        t0 = time.perf_counter()
        cropper.process_dir(data, out)
        dt = time.perf_counter() - t0
    faces = len(os.listdir(out))
    for d in (data, out):
        shutil.rmtree(d, ignore_errors=True)
    log(f"[ref cpu] config 1 (landmark-only): {faces} faces in {dt:.1f}s "
        f"-> {faces / dt:.2f} faces/s")
    return {"faces_per_s": round(faces / dt, 3), "n": n, "workers": 4}


def measure_detect(n_batch: int = 8) -> dict:
    """Config 2: reference detect@1024 + align + crop, CelebA-sized sources."""
    import warnings

    import cv2
    import torch

    from refcompat import import_reference

    import_reference()
    from face_crop_plus.models import RetinaFace
    from face_crop_plus.utils import as_batch, as_tensor

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        torch.manual_seed(0)
        model = RetinaFace(strategy="largest", vis=0.6).eval()

    data = _dataset(n_batch)
    files = sorted(os.listdir(data))
    images = [
        cv2.cvtColor(cv2.imread(os.path.join(data, f)), cv2.COLOR_BGR2RGB)
        for f in files
    ]
    shutil.rmtree(data, ignore_errors=True)

    with torch.no_grad():
        batch, unscales, paddings = as_batch(images, (1024, 1024))
        batch_t = as_tensor(batch, "cpu")
        # Random weights: calibrate vis to the quantile admitting ~256
        # candidates/image — the real-weights candidate scale.
        x = batch_t[:1, [2, 1, 0]] - torch.tensor([104, 117, 123]).view(3, 1, 1)
        scores, _, _ = model(x)
        s = scores[..., 1].flatten()
        model.vis_threshold = float(torch.quantile(
            s, 1.0 - 256.0 / s.numel()).item())
        log(f"[ref cpu] calibrated vis={model.vis_threshold:.6f}")

        t0 = time.perf_counter()
        landmarks, indices = model.predict(batch_t)
        dt_predict = time.perf_counter() - t0

    # Align+crop on the predicted landmarks via the reference Cropper helper
    # (cropper.py:441-552), exactly as process_batch wires it (:839-843).
    from face_crop_plus import Cropper

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cropper = Cropper(
            output_size=(256, 256), det_threshold=None, enh_threshold=None,
            device="cpu",
        )
    t0 = time.perf_counter()
    if len(indices):
        cropper.crop_align(batch, paddings, indices, landmarks)
    dt_crop = time.perf_counter() - t0

    dt = dt_predict + dt_crop
    fps = len(images) / dt  # one face per image (strategy largest)
    log(f"[ref cpu] config 2 (detect@1024+align+crop): {len(images)} images "
        f"in {dt:.1f}s (predict {dt_predict:.1f}s) -> {fps:.3f} faces/s")
    return {
        "faces_per_s": round(fps, 4),
        "predict_s_per_image": round(dt_predict / len(images), 2),
        "n": len(images),
        "note": "vendored-faithful torchvision backbone; vis calibrated to "
                "~256 candidates/image under random weights",
    }


def measure_rrdb(size: int = 256) -> dict:
    """Config 3 kernel: reference RRDBNet SR MP/s (forward + x0.25 undo)."""
    import torch

    from refcompat import import_reference

    import_reference()
    from face_crop_plus.models.rrdb import RRDBNet

    torch.manual_seed(0)
    model = RRDBNet().eval()
    x = torch.rand(1, 3, size, size)
    with torch.no_grad():
        t0 = time.perf_counter()
        y = model(x)
        torch.nn.functional.interpolate(
            y, scale_factor=0.25, mode="bicubic", antialias=True
        )
        dt = time.perf_counter() - t0
    mps = size * size / dt / 1e6
    log(f"[ref cpu] config 3 (RRDB SR): {dt:.1f}s per {size}² -> {mps:.4f} MP/s")
    return {"mp_per_s": round(mps, 4), "size": size}


def measure_bisenet(batch: int = 8) -> dict:
    """Config 4 kernel: reference BiSeNet faces parsed/s at 512²."""
    import torch

    from refcompat import import_reference

    import_reference()
    from face_crop_plus.models.bise import BiSeNet

    torch.manual_seed(0)
    model = BiSeNet().eval()
    x = torch.rand(batch, 3, 512, 512)
    with torch.no_grad():
        model(x[:1])  # warm
        t0 = time.perf_counter()
        out = model(x)
        out.argmax(1)
        dt = time.perf_counter() - t0
    fps = batch / dt
    log(f"[ref cpu] config 4 (BiSeNet parse): {batch} faces in {dt:.1f}s "
        f"-> {fps:.2f} faces/s")
    return {"faces_per_s": round(fps, 3), "batch": batch}


def load_cached() -> dict | None:
    if os.path.isfile(CACHE):
        with open(CACHE) as f:
            data = json.load(f)
        if data.get("version") == VERSION:
            return data
    return None


def run(force: bool = False) -> dict:
    cached = load_cached()
    if cached is not None and not force:
        return cached
    from face_crop_plus_tpu.utils.profiling import host_speed_probe

    data = {
        "version": VERSION,
        "host": os.uname().nodename,
        "cpus": os.cpu_count(),
        # Fixed-work host fingerprint at capture time: later benchmark runs
        # re-run the probe and report the ratio, so a vs_baseline computed
        # against these cached denominators on a *loaded* shared host is
        # readable as contention rather than regression.
        "host_probe_rtps": host_speed_probe(),
        "landmarks_e2e": measure_landmarks_e2e(),
        "detect": measure_detect(),
        "rrdb_sr": measure_rrdb(),
        "bisenet_parse": measure_bisenet(),
    }
    with open(CACHE, "w") as f:
        json.dump(data, f, indent=1)
    return data


if __name__ == "__main__":
    print(json.dumps(run(force="--force" in sys.argv), indent=1))
