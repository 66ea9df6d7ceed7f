"""Real-checkpoint fidelity validation (run in a networked environment).

This environment has zero egress, so the released checkpoints
(`retinaface_detector.pth`, `bsrgan_x4_enhancer.pth`, `bise_parser.pth` —
reference `_layers.py:13,27-35`) cannot be fetched here; every code path
between URL and crops is covered by tests with synthetic checkpoints.  This
script is the one remaining networked step, ready to execute anywhere with
internet (or with the .pth files pre-placed in the cache/--weights-dir):

1. Fetch + convert all three checkpoints (models/weights.py auto-download).
2. RRDBNet + BiSeNet: forward parity vs the *reference torch modules*
   loaded with the same real weights (torchvision not required for these).
3. Detection: run the full pipeline over the 8 demo images and write crops
   + landmarks to --out; if torchvision is importable, also run the
   reference RetinaFace and report landmark deltas (target < 0.5 px).

Exit codes: 0 = validated, 2 = weights unavailable (skipped), 1 = mismatch.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

DEMO = "/root/reference/demo/input_images"
MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights_manifest.json")


def fail(msg):
    print(f"FAIL: {msg}")
    sys.exit(1)


def load_manifest() -> dict:
    with open(MANIFEST) as f:
        return json.load(f)


def verify_checksums(
    manifest: dict, pth_paths: dict, trust_first_use: bool = False
) -> None:
    """Verifies (or, with explicit consent, records) the .pth checksums.

    Checksums cannot be pre-computed in the zero-egress build environment,
    so the manifest ships with nulls.  The gate is FAIL-CLOSED: a null
    entry is an error unless the operator passes ``--trust-first-use``,
    which records the observed hashes (and prints the manifest to commit);
    every later run hard-verifies against the pinned values.  This keeps a
    corrupted or substituted first download from being silently accepted
    and then enforced.
    """
    changed = False
    for name, path in pth_paths.items():
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        digest, size = h.hexdigest(), os.path.getsize(path)
        entry = manifest["files"][name]
        if entry["sha256"] is None:
            if not trust_first_use:
                fail(
                    f"manifest has no pinned sha256 for '{name}' and "
                    "--trust-first-use was not given. Verify the artifact "
                    "out-of-band (or accept this download explicitly) and "
                    f"re-run with --trust-first-use; observed sha256="
                    f"{digest} ({size} B)."
                )
            entry["sha256"], entry["bytes"] = digest, size
            changed = True
            print(f"manifest: recorded {name} sha256={digest[:16]}… ({size} B)")
        elif entry["sha256"] != digest:
            fail(
                f"checksum mismatch for {name}: manifest {entry['sha256'][:16]}… "
                f"vs file {digest[:16]}… — upstream artifact changed or download corrupt"
            )
        else:
            print(f"manifest: {name} checksum OK")
    if changed:
        with open(MANIFEST, "w") as f:
            json.dump(manifest, f, indent=2)
        print(f"manifest updated — commit {MANIFEST}")


def main():
    # Some environments register accelerator plugins that override the
    # JAX_PLATFORMS env var via jax.config at interpreter startup; re-assert
    # the requested platform before any backend initializes (parity deltas
    # here must be measured at the platform's own precision).
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", default=None)
    ap.add_argument("--out", default="/tmp/fcpt_real_weights")
    ap.add_argument("--demo-dir", default=DEMO)
    ap.add_argument("--resize", type=int, default=1024,
                    help="detector resolution (lower it for CPU smoke runs)")
    ap.add_argument("--det-threshold", type=float, default=0.6,
                    help="detector confidence threshold (the registered gate "
                         "uses 0.6; smoke runs with synthetic weights pick a "
                         "flip-proof value)")
    ap.add_argument("--output-size", type=int, default=256,
                    help="crop output size (lower it for CPU smoke runs)")
    ap.add_argument("--label-size", type=int, default=512,
                    help="BiSeNet label-agreement resolution (512 = the "
                         "production inference size; lower for smoke runs)")
    ap.add_argument(
        "--trust-first-use", action="store_true",
        help="record (rather than reject) checksums the manifest has not "
             "pinned yet — requires explicit operator consent; the updated "
             "manifest must then be committed",
    )
    args = ap.parse_args()

    from face_crop_plus_tpu.models.weights import (
        PTH_FILENAMES,
        default_cache_dir,
        find_weights,
    )

    weights, pth_paths = {}, {}
    for name in ("retinaface", "rrdb", "bisenet"):
        w = find_weights(name, args.weights_dir)
        if w is None:
            print(f"SKIP: no weights for '{name}' (no network and nothing cached)")
            sys.exit(2)
        weights[name] = w
        for d in (args.weights_dir, default_cache_dir()):
            p = os.path.join(d or "", PTH_FILENAMES[name])
            if d and os.path.isfile(p):
                pth_paths[name] = p
                break
    print("all three checkpoints present and converted")

    manifest = load_manifest()
    tol = manifest["tolerances"]
    verify_checksums(manifest, pth_paths, args.trust_first_use)

    import jax.numpy as jnp
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    from refcompat import import_reference

    import_reference()

    # --- RRDBNet forward parity with real weights --------------------------
    from face_crop_plus.models.rrdb import RRDBNet as RefRRDB

    from face_crop_plus_tpu.models.enhancement import rrdbnet_forward
    from face_crop_plus_tpu.ops.nn import Params

    tm = RefRRDB().eval()
    if "rrdb" in pth_paths:  # load the same artifact our converter consumed
        tm.load_state_dict(torch.load(pth_paths["rrdb"], map_location="cpu"))
    else:
        tm.load("cpu")  # reference LoadMixin fetch/cache (needs network)
    x = np.random.default_rng(0).uniform(0, 1, (1, 24, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    p = Params({k: jnp.asarray(v) for k, v in weights["rrdb"].items()})
    got = np.asarray(rrdbnet_forward(p, jnp.asarray(x)))
    ref = want.transpose(0, 2, 3, 1)
    d = np.abs(got - ref).max() / (np.abs(ref).max() + 1.0)
    print(f"rrdb forward rel|Δ| vs reference (real weights): {d:.2e}")
    if d > tol["rrdb_forward_rel_max"]:
        fail("RRDBNet real-weight forward diverges")

    # --- BiSeNet forward parity with real weights --------------------------
    from face_crop_plus.models.bise import BiSeNet as RefBiSe

    from face_crop_plus_tpu.models.parsing import bisenet_forward

    bm = RefBiSe().eval()
    if "bisenet" in pth_paths:
        bm.load_state_dict(torch.load(pth_paths["bisenet"], map_location="cpu"))
    else:
        bm.load("cpu")
    xb = np.random.default_rng(1).normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = bm(torch.from_numpy(xb.transpose(0, 3, 1, 2))).numpy()
    pb = Params({k: jnp.asarray(v) for k, v in weights["bisenet"].items()})
    got = np.asarray(bisenet_forward(pb, jnp.asarray(xb)))
    ref = want.transpose(0, 2, 3, 1)
    d = np.abs(got - ref).max() / (np.abs(ref).max() + 1.0)
    print(f"bise forward rel|Δ| vs reference (real weights): {d:.2e}")
    if d > tol["bisenet_forward_rel_max"]:
        fail("BiSeNet real-weight forward diverges")

    # Label-level agreement at the production 512² inference size (argmax
    # can flip on logit near-ties even when forwards agree tightly; the
    # registered tolerance bounds how often).
    ls = args.label_size
    xi = np.random.default_rng(2).uniform(0, 1, (1, ls, ls, 3)).astype(np.float32)
    with torch.no_grad():
        ref_labels = bm(torch.from_numpy(xi.transpose(0, 3, 1, 2))).argmax(1).numpy()
    got_labels = np.asarray(
        bisenet_forward(pb, jnp.asarray(xi)).argmax(-1)
    )
    agree = (got_labels == ref_labels).mean()
    print(f"bise {ls}² label agreement vs reference: {agree:.4f}")
    if agree < tol["parse_label_agreement_min"]:
        fail("BiSeNet label agreement below the registered tolerance")

    # --- Full pipeline goldens over the demo images ------------------------
    from face_crop_plus_tpu import Cropper

    out_dir = os.path.join(args.out, "crops")
    c = Cropper(
        output_size=args.output_size,
        resize_size=(args.resize, args.resize),
        det_threshold=args.det_threshold,
        enh_threshold=None,
        weights_dir=args.weights_dir,
    )
    c.process_dir(args.demo_dir, out_dir, desc=None)
    n = len(os.listdir(out_dir))
    print(f"detection pipeline produced {n} crops at {out_dir}")
    if n == 0:
        fail("real-weight detection produced no crops on the demo images")

    # Landmark deltas vs the reference detector.  Works with either the real
    # torchvision or refcompat's faithful vendored ResNet-50 backbone (r3):
    # real weights fully determine the forward either way.
    from face_crop_plus.models.retinaface import RetinaFace as RefRF

    rf = RefRF(strategy="all", vis=args.det_threshold).eval()
    if "retinaface" in pth_paths:
        rf.load_state_dict(torch.load(pth_paths["retinaface"], map_location="cpu"))
    else:
        rf.load("cpu")
    imgs, names = [], sorted(os.listdir(args.demo_dir))
    import cv2

    for f in names:
        im = cv2.cvtColor(cv2.imread(os.path.join(args.demo_dir, f)), cv2.COLOR_BGR2RGB)
        imgs.append(im)
    from face_crop_plus.utils import as_batch, as_tensor

    batch, _, _ = as_batch(imgs, (args.resize, args.resize))
    with torch.no_grad():
        ref_lm, ref_idx = rf.predict(as_tensor(batch, torch.device("cpu")))

    our = c.det_model
    our.strategy = "all"
    lm, idx = our.predict(np.asarray(batch))
    if len(lm) != len(ref_lm):
        fail(f"face count mismatch: ours {len(lm)} vs reference {len(ref_lm)}")
    if list(idx) != list(ref_idx):
        fail("face→image index mismatch")

    def sort_within_images(landmarks, indices):
        """Face order within an image is score-descending on both sides, but
        exact score ties are ordered arbitrarily (torch's sort is unstable);
        compare sets, not sequences, by sorting faces lexicographically."""
        landmarks = np.asarray(landmarks)
        indices = np.asarray(indices)
        out = np.empty_like(landmarks)
        for i in np.unique(indices):
            rows = landmarks[indices == i]
            order = np.lexsort(rows.reshape(len(rows), -1).T[::-1])
            out[indices == i] = rows[order]
        return out

    d = (
        np.abs(sort_within_images(lm, idx) - sort_within_images(ref_lm, ref_idx)).max()
        if len(lm)
        else 0.0
    )
    print(f"detector landmark max|Δ| vs reference (real weights): {d:.3f} px")
    if d > tol["detector_landmark_px_max"]:
        fail(f"landmark delta exceeds {tol['detector_landmark_px_max']} px")

    # Crop-level goldens: the reference Cropper's own crops vs ours on the
    # demo images (crop_source="interim" makes the fused path sample the
    # same interim pixels the reference warps).  The reference Cropper's
    # _init_models fetches weights via torch.hub — in a networked run that
    # succeeds; otherwise this block reports and continues (the parity
    # above already gates).
    try:
        import shutil

        from face_crop_plus import Cropper as RefCropper

        ref_out = os.path.join(args.out, "ref_crops")
        shutil.rmtree(ref_out, ignore_errors=True)
        rc = RefCropper(
            output_size=args.output_size,
            resize_size=(args.resize, args.resize),
            det_threshold=args.det_threshold,
            enh_threshold=None,
            device="cpu",
        )
        rc.process_dir(args.demo_dir, ref_out)

        our_out = os.path.join(args.out, "crops_interim")
        shutil.rmtree(our_out, ignore_errors=True)
        ci = Cropper(
            output_size=args.output_size,
            resize_size=(args.resize, args.resize),
            det_threshold=args.det_threshold,
            enh_threshold=None,
            weights_dir=args.weights_dir,
            crop_source="interim",
        )
        ci.process_dir(args.demo_dir, our_out)

        ref_files = sorted(os.listdir(ref_out))
        our_files = sorted(os.listdir(our_out))
        if ref_files != our_files:
            fail(f"crop file sets differ: {ref_files} vs {our_files}")
        worst_mean, worst_frac = 0.0, 1.0
        for f in ref_files:
            a = cv2.imread(os.path.join(ref_out, f)).astype(int)
            b = cv2.imread(os.path.join(our_out, f)).astype(int)
            delta = np.abs(a - b)
            worst_mean = max(worst_mean, delta.mean())
            worst_frac = min(worst_frac, (delta <= 8).mean())
        print(f"crops vs reference: worst mean|Δ| {worst_mean:.2f} levels, "
              f"worst within-8-levels {worst_frac:.4f}")
        if worst_mean > tol["crop_mean_abs_levels_max"]:
            fail("crop intensity delta exceeds the registered tolerance")
        if worst_frac < tol["crop_pixels_within_8_levels_min"]:
            fail("crop pixel agreement below the registered tolerance")
    except Exception as e:  # reference weight fetch needs network
        print(f"reference-Cropper crop comparison skipped ({e})")

    print("OK: real-weight fidelity validated")


if __name__ == "__main__":
    main()
