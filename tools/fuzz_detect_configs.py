"""Detection-mode config-level e2e fuzz vs the executing reference.

VERDICT r3 next-step #8: the r3 landmark-only config fuzz caught a real
parity bug (overwrite-winner ordering); this extends the same discipline to
*detection-mode* configurations with random weights: random sizes,
strategies, paddings, allow_skew, gated enhancement and attr/mask parsing —
each trial runs the executing reference Cropper (cropper.py:748-850 +
611-746) and ours over the same directory with shared per-trial random
weights and compares output trees file for file with pixel bands.

Thresholds are placed mid-gap of the reference's own measured scores/face
factors per configuration (tests/test_ref_crossval._robust_thresholds), so
backend float noise cannot flip detect/gate decisions — any tree mismatch is
a real semantic divergence.

Usage: python tools/fuzz_detect_configs.py [n_trials] [start_seed]
(CPU-only; ~2-4 min/trial on one core.  Results land in STATUS.md notes.)
"""

import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("FCPT_NO_DOWNLOAD", "1")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import torch  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_fake_load(seed):
    """Per-trial deterministic stand-in for LoadMixin.load (_layers.py:16)."""

    def load(self, device="cpu"):
        gen = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in self.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
            for m in self.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    n = m.num_features
                    m.running_mean.copy_(torch.randn(n, generator=gen) * 0.3)
                    m.running_var.copy_(torch.rand(n, generator=gen) + 0.5)
            # 0.05-scale weights leave the landmark/bbox deltas near zero:
            # every decoded landmark collapses onto its anchor center, the
            # affine estimate degenerates and both Croppers emit empty trees
            # (a vacuous pass).  Spread the head *biases* so decoded points
            # are well-conditioned — the state dict is converted and shared,
            # so parity is unaffected.
            for attr in ("LandmarkHead", "BboxHead"):
                for head in getattr(self, attr, []) or []:
                    for p in head.parameters():
                        if p.ndim == 1:
                            p.copy_(torch.randn(p.shape, generator=gen) * 2.0)
        self.to(torch.device(device) if isinstance(device, str) else device)
        self.eval()
        for p in self.parameters():
            p.requires_grad = False
        return self

    return load


def tree(root):
    return sorted(
        os.path.relpath(os.path.join(r, f), root)
        for r, _d, fs in os.walk(root)
        for f in fs
    )


def compare_trees(ref_out, our_out, strategy):
    """File-for-file tree parity + matched-multiset pixel bands (the
    composed-crossval comparison, tests/test_ref_crossval.py)."""
    ref_tree = tree(ref_out)
    our_tree = tree(our_out)
    assert our_tree == ref_tree, (
        f"tree mismatch:\n  ref only: {sorted(set(ref_tree) - set(our_tree))[:8]}"
        f"\n  ours only: {sorted(set(our_tree) - set(ref_tree))[:8]}"
    )

    groups = defaultdict(list)
    for rel in ref_tree:
        d, fname = os.path.split(rel)
        stem = re.sub(r"_\d+(?=\.png$)", "", fname) if strategy == "all" else fname
        groups[(d, stem)].append(rel)

    worst = 0.0
    for (d, _stem), rels in groups.items():
        ref_imgs = [cv2.imread(os.path.join(ref_out, r)).astype(np.int32) for r in rels]
        our_imgs = [cv2.imread(os.path.join(our_out, r)).astype(np.int32) for r in rels]
        for a, b in zip(ref_imgs, our_imgs):
            assert a is not None and b is not None and a.shape == b.shape, d
        is_mask = d.split(os.sep)[-1].endswith("_mask")
        used = set()
        for r, a in zip(rels, ref_imgs):
            best, bj = None, None
            for j, b in enumerate(our_imgs):
                if j in used:
                    continue
                m = np.abs(a - b).mean()
                if best is None or m < best:
                    best, bj = m, j
            used.add(bj)
            if is_mask:
                agree = (a == our_imgs[bj]).mean()
                assert agree > 0.99, f"{r}: mask agreement {agree:.4f}"
            else:
                assert best < 3.0, f"{r}: best-match mean abs diff {best:.3f}"
                worst = max(worst, best)
    return len(ref_tree), worst


def run_trial(seed, scratch):
    import shutil

    import test_ref_crossval as trc
    from face_crop_plus import Cropper as RefCropper
    from face_crop_plus.models import RetinaFace as RefRF
    from face_crop_plus.models import _layers as ref_layers

    from face_crop_plus_tpu import Cropper as OurCropper
    from face_crop_plus_tpu.models.weights import convert_state_dict, save_npz
    from face_crop_plus_tpu.utils.batching import as_batch

    rng = np.random.default_rng(seed)
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)

    orig_load = ref_layers.LoadMixin.load
    ref_layers.LoadMixin.load = make_fake_load(10_000 + seed)
    try:
        # ---- inputs: demo images at random small sizes --------------------
        demo = "/root/reference/demo/input_images"  # same corpus as tests/conftest.py:41
        files = sorted(os.listdir(demo))
        rng.shuffle(files)
        files = files[: int(rng.integers(2, 5))]
        in_dir = os.path.join(scratch, "in")
        os.makedirs(in_dir)
        images = []
        for fname in files:
            img = cv2.imread(os.path.join(demo, fname))
            w = int(rng.integers(40, 91))
            h = int(rng.integers(40, 91))
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
            cv2.imwrite(os.path.join(in_dir, os.path.splitext(fname)[0] + ".png"), img)
            images.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))

        # ---- random configuration ----------------------------------------
        strategy = str(rng.choice(["all", "best", "largest"]))
        resize = int(rng.integers(20, 33)) * 2  # 40..64 even
        out_w = int(rng.integers(24, 49))
        out_h = int(rng.integers(24, 49))
        padding = str(
            rng.choice(["constant", "replicate", "reflect", "wrap", "reflect_101"])
        )
        allow_skew = bool(rng.random() < 0.25)
        with_enh = bool(rng.random() < 0.4)
        with_parse = bool(rng.random() < 0.5)
        face_factor = float(rng.uniform(0.45, 0.85))

        interim, _, _ = as_batch(list(images), (resize, resize))
        tm_det = make_fake_load(10_000 + seed)(RefRF(strategy=strategy))
        det_thr, enh_thr, _lm, _idx = trc._robust_thresholds(tm_det, interim)

        common = dict(
            output_size=(out_w, out_h),
            resize_size=resize,
            strategy=strategy,
            det_threshold=det_thr,
            enh_threshold=enh_thr if with_enh else None,
            face_factor=face_factor,
            padding=padding,
            allow_skew=allow_skew,
            output_format="png",
            batch_size=int(rng.integers(1, 4)),
            num_processes=1,
        )

        if with_parse:
            pre_out = os.path.join(scratch, "pre")
            pre = dict(common, enh_threshold=None, attr_groups=None, mask_groups=None)
            RefCropper(device="cpu", **pre).process_dir(in_dir, pre_out, desc=None)
            pre_files = sorted(os.listdir(pre_out))
            if not pre_files:
                return "skip(no-crops)"
            pre_crops = np.stack(
                [
                    cv2.cvtColor(
                        cv2.imread(os.path.join(pre_out, f)), cv2.COLOR_BGR2RGB
                    )
                    for f in pre_files
                ]
            )
            # NOT trc._robust_parse_class: that helper loads its probe with
            # the test module's fixed-seed weights, which here would diverge
            # from the per-trial weights the Croppers run — the dominant
            # class of the wrong parser makes every group empty (vacuous).
            from face_crop_plus.models.bise import BiSeNet as RefBiSeNet

            probe = ref_layers.LoadMixin.load(
                RefBiSeNet(attr_groups={str(k): [k] for k in range(1, 19)})
            )
            probe.attr_threshold = 500
            with torch.no_grad():
                attr, _ = probe.predict(
                    torch.from_numpy(
                        np.ascontiguousarray(pre_crops.transpose(0, 3, 1, 2))
                    ).float()
                )
            full = [k for k, v in attr.items() if len(v) == len(pre_crops)]
            assert full, "no class is robustly present on every face"
            dom = int(max(full, key=int))
            kind = int(rng.integers(3))
            if kind == 0:
                common["attr_groups"] = {"a": [dom], "never": [dom, -dom]}
            elif kind == 1:
                common["mask_groups"] = {"m": [dom]}
            else:
                common["attr_groups"] = {"a": [dom]}
                common["mask_groups"] = {"m": [dom]}

        cfg_desc = (
            f"strategy={strategy} out=({out_w},{out_h}) resize={resize} "
            f"pad={padding} skew={allow_skew} ff={face_factor:.2f} "
            f"enh={with_enh} parse={'attr' if common.get('attr_groups') else ''}"
            f"{'+mask' if common.get('mask_groups') else ''}"
        )
        log(f"  config: {cfg_desc}")

        ref_c = RefCropper(device="cpu", **common)
        ref_out = os.path.join(scratch, "ref_out")
        ref_c.process_dir(in_dir, ref_out, desc=None)

        wdir = os.path.join(scratch, "weights")
        os.makedirs(wdir)
        save_npz(
            convert_state_dict(ref_c.det_model.state_dict()),
            os.path.join(wdir, "retinaface.npz"),
        )
        if ref_c.enh_model is not None:
            save_npz(
                convert_state_dict(ref_c.enh_model.state_dict()),
                os.path.join(wdir, "rrdb.npz"),
            )
        if ref_c.par_model is not None:
            save_npz(
                convert_state_dict(ref_c.par_model.state_dict()),
                os.path.join(wdir, "bisenet.npz"),
            )

        our_c = OurCropper(
            device="cpu",
            weights_dir=wdir,
            max_fused_shapes=0,  # staged path: identical cv2 interim pixels
            **common,
        )
        assert our_c.det_model.pretrained
        if our_c.enh_model is not None:
            our_c.enh_model.trunk_mode = "plain"
        our_out = os.path.join(scratch, "our_out")
        our_c.process_dir(in_dir, our_out, desc=None)

        n_files, worst = compare_trees(ref_out, our_out, strategy)
        if n_files == 0:
            # Both trees empty: agreement, but only on "no faces survived" —
            # don't let these count as substantive coverage.
            return "ok-empty(both trees empty)"
        return f"ok({n_files} files, worst crop mad {worst:.3f})"
    finally:
        ref_layers.LoadMixin.load = orig_load


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    scratch = "/tmp/fcpt_detect_fuzz"
    fails = 0
    for seed in range(start, start + n):
        t0 = time.time()
        try:
            res = run_trial(seed, scratch)
        except AssertionError as e:
            msg = str(e).splitlines()[0] if str(e) else "assert"
            # Threshold-probe assertions are skips (no robust config exists
            # for this draw), comparison assertions are failures.
            if "robust" in msg or "yields" in msg or "spread" in msg:
                res = f"skip({msg})"
            else:
                fails += 1
                res = f"FAIL: {e}"
        log(f"trial {seed}: {res}  [{time.time() - t0:.0f}s]")
    log(f"\n{fails} failures / {n} trials")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
