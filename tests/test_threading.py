"""Threaded process_dir: multiple host workers produce identical results."""

import os

import numpy as np

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite


def test_threadpool_matches_serial(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    for i in range(12):
        n = f"t{i:02d}.png"
        imwrite(str(d / n), rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        names.append(n)
    lm = tmp_path / "lm.txt"
    lm.write_text(
        "\n".join(f"{n} 18 22 46 22 32 38 22 52 42 52" for n in names)
    )

    def run(num_processes, out_name):
        out = str(tmp_path / out_name)
        c = Cropper(
            output_size=32,
            landmarks=str(lm),
            det_threshold=None,
            enh_threshold=None,
            device="cpu",
            batch_size=4,
            num_processes=num_processes,
        )
        c.process_dir(str(d), out, desc=None)
        return out

    serial = run(1, "out1")
    threaded = run(3, "out3")

    assert sorted(os.listdir(serial)) == sorted(os.listdir(threaded)) == sorted(names)
    for n in names:
        a = imread_rgb(os.path.join(serial, n))
        b = imread_rgb(os.path.join(threaded, n))
        np.testing.assert_array_equal(a, b)
