"""Multi-host file-list sharding: shards partition the directory exactly."""

import os

import numpy as np

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imwrite


def test_file_shards_partition(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    for i in range(10):
        n = f"x{i}.png"
        imwrite(str(d / n), rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        names.append(n)
    lm = tmp_path / "lm.txt"
    lm.write_text(
        "\n".join(f"{n} 8 10 24 10 16 18 10 26 22 26" for n in names)
    )

    outs = []
    for shard in range(3):
        out = tmp_path / f"out{shard}"
        c = Cropper(
            output_size=16,
            landmarks=str(lm),
            det_threshold=None,
            enh_threshold=None,
            device="cpu",
            batch_size=4,
        )
        c.process_dir(str(d), str(out), desc=None, shard_index=shard, num_shards=3)
        outs.append(set(os.listdir(out)))

    # Disjoint and complete.
    assert outs[0] | outs[1] | outs[2] == set(names)
    assert not (outs[0] & outs[1]) and not (outs[1] & outs[2]) and not (outs[0] & outs[2])
