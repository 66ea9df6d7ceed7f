"""Weight conversion CLI: reference ``.pth`` checkpoints → native ``.npz``.

Usage::

    python -m face_crop_plus_tpu.convert --pth retinaface_detector.pth \
        --model retinaface [--out weights/retinaface.npz] [--verify]

The reference downloads its three checkpoints from
``https://github.com/mantasu/face-crop-plus/releases/download/v1.0.0/``
(see ``models/weights.py``); download them once on a machine with network
access, then convert here.  ``--verify`` checks the converted key set against
the model's randomly-initialized parameter structure (names and shapes must
match exactly), which catches conversion/architecture drift without needing
the network to run.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from .models.weights import (
    PTH_FILENAMES,
    convert_pth_file,
    default_cache_dir,
    save_npz,
)

def _init_reference(model: str) -> dict:
    """Random-init params for structural verification (abstract trace)."""
    from .ops.nn import init_structure

    if model == "retinaface":
        from .models.detection import retinaface_forward

        return init_structure(retinaface_forward, (1, 32, 32, 3), 0)
    elif model == "rrdb":
        from .models.enhancement import rrdbnet_forward

        return init_structure(rrdbnet_forward, (1, 16, 16, 3), 0)
    elif model == "bisenet":
        from .models.parsing import bisenet_forward

        return init_structure(bisenet_forward, (1, 64, 64, 3), 0)
    raise ValueError(f"Unknown model: {model}")


def verify_structure(converted: dict, model: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = exact match)."""
    expected = _init_reference(model)
    problems = []
    for k in sorted(set(expected) - set(converted)):
        problems.append(f"missing from checkpoint: {k} {expected[k].shape}")
    for k in sorted(set(converted) - set(expected)):
        problems.append(f"unexpected in checkpoint: {k} {np.shape(converted[k])}")
    for k in sorted(set(converted) & set(expected)):
        if tuple(np.shape(converted[k])) != tuple(expected[k].shape):
            problems.append(
                f"shape mismatch: {k} checkpoint {np.shape(converted[k])} "
                f"vs model {expected[k].shape}"
            )
    return problems


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--pth", required=True, help="Path to the torch .pth checkpoint")
    ap.add_argument(
        "--model",
        choices=sorted(PTH_FILENAMES),
        default=None,
        help="Target model (inferred from the filename when omitted)",
    )
    ap.add_argument("--out", default=None, help="Output .npz path (default: cache dir)")
    ap.add_argument(
        "--verify",
        action="store_true",
        help="Check converted names/shapes against the model structure",
    )
    args = ap.parse_args(argv)

    model = args.model
    if model is None:
        base = os.path.basename(args.pth)
        for name, fname in PTH_FILENAMES.items():
            if base == fname:
                model = name
                break
        if model is None:
            ap.error("--model is required (filename not recognized)")

    converted = convert_pth_file(args.pth)
    print(f"converted {len(converted)} tensors from {args.pth}")

    if args.verify:
        problems = verify_structure(converted, model)
        if problems:
            print(f"VERIFY FAILED ({len(problems)} problems):")
            for p in problems[:40]:
                print("  " + p)
            return 1
        print("verify OK: key set and shapes match the model structure")

    out = args.out or os.path.join(default_cache_dir(), f"{model}.npz")
    if not out.endswith(".npz"):
        out += ".npz"  # np.savez appends it anyway; keep the printed path true
    save_npz(converted, out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
