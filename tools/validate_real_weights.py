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
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

DEMO = "/root/reference/demo/input_images"


def fail(msg):
    print(f"FAIL: {msg}")
    sys.exit(1)


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
    if d > 1e-4:
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
    if d > 1e-3:
        fail("BiSeNet real-weight forward diverges")

    # --- Full pipeline goldens over the demo images ------------------------
    from face_crop_plus_tpu import Cropper

    out_dir = os.path.join(args.out, "crops")
    c = Cropper(
        output_size=256,
        resize_size=(args.resize, args.resize),
        det_threshold=0.6,
        enh_threshold=None,
        weights_dir=args.weights_dir,
    )
    c.process_dir(args.demo_dir, out_dir, desc=None)
    n = len(os.listdir(out_dir))
    print(f"detection pipeline produced {n} crops at {out_dir}")
    if n == 0:
        fail("real-weight detection produced no crops on the demo images")

    # Landmark deltas vs the reference detector (needs torchvision).
    try:
        import torchvision  # noqa: F401

        from face_crop_plus.models.retinaface import RetinaFace as RefRF

        rf = RefRF(strategy="all").eval()
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
        d = np.abs(np.asarray(lm) - np.asarray(ref_lm)).max()
        print(f"detector landmark max|Δ| vs reference (real weights): {d:.3f} px")
        if d > 0.5:
            fail("landmark delta exceeds 0.5 px")
    except (ImportError, RuntimeError) as e:
        # ImportError: torchvision absent.  RuntimeError: refcompat's
        # torchvision *stub* (installed for the parity imports above) — the
        # real reference detector needs the real torchvision either way.
        print(f"reference detector comparison skipped ({e}); "
              "crops + RRDB/BiSeNet parity above still validate)")

    print("OK: real-weight fidelity validated")


if __name__ == "__main__":
    main()
