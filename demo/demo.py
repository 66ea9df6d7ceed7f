"""Runnable demo: crop, enhance and group the bundled sample images.

Mirrors the reference demo (demo/demo.py) on the same 8 sample images.
Toggle the feature flags below; on a machine without converted pretrained
weights the models run randomly initialized (a warning is printed) — the
pipeline still exercises end to end.
"""

import os
import sys

# Runnable from a plain checkout without installing (or setting PYTHONPATH,
# which some accelerator-plugin environments are sensitive to).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from face_crop_plus_tpu import Cropper

INPUT_DIR = os.environ.get(
    "FCPT_DEMO_INPUT", "/root/reference/demo/input_images"
)
OUTPUT_DIR = None  # defaults to INPUT_DIR + "_faces"

TEST_QUALITY_ENHANCEMENT = True
TEST_ATTR_GROUPING = True
TEST_MASK_GROUPING = False

if __name__ == "__main__":
    enh_threshold = 0.001 if TEST_QUALITY_ENHANCEMENT else None
    attr_groups = (
        {"hat": [18], "no_accessories": [-6, -9, -15, -18]}
        if TEST_ATTR_GROUPING
        else None
    )
    mask_groups = (
        {"nose": [10], "eyes_and_eyebrows": [2, 3, 4, 5]}
        if TEST_MASK_GROUPING
        else None
    )

    cropper = Cropper(
        output_size=(256, 256),
        output_format="jpg",
        face_factor=0.7,
        strategy="all",
        device="auto",
        enh_threshold=enh_threshold,
        attr_groups=attr_groups,
        mask_groups=mask_groups,
    )

    cropper.process_dir(input_dir=INPUT_DIR, output_dir=OUTPUT_DIR)
    print(cropper.stats.report())
