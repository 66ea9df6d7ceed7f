"""Device-side resize+pad geometry matches the host as_batch contract."""

import numpy as np
import jax.numpy as jnp

from face_crop_plus_tpu.pipeline import device_resize_pad
from face_crop_plus_tpu.utils.batching import as_batch


def test_device_resize_pad_geometry(rng):
    # Tall images: width-padded; wide images: height-padded.
    for h, w in [(200, 100), (80, 300), (128, 128)]:
        imgs = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)
        out, scale, pad = device_resize_pad(jnp.asarray(imgs), (128, 128))
        host, host_scale, host_pad = as_batch(list(imgs), (128, 128))
        assert out.shape == host.shape == (2, 128, 128, 3)
        assert np.isclose(float(scale), host_scale[0])
        np.testing.assert_array_equal(np.asarray(pad), host_pad[0])


def test_device_resize_pad_padding_is_zero(rng):
    imgs = rng.integers(1, 255, (1, 100, 50, 3), dtype=np.uint8)
    out, _scale, pad = device_resize_pad(jnp.asarray(imgs), (64, 64))
    t, b, l, r = (int(x) for x in np.asarray(pad))
    out = np.asarray(out)
    if l:
        assert out[0, :, :l].sum() == 0
    if r:
        assert out[0, :, -r:].sum() == 0


def test_landmark_roundtrip_through_device_batching(rng):
    # A point at source coords maps into padded-interim coords by
    # *scale + (l, t) and back — the fused pipeline's inverse mapping.
    imgs = rng.integers(0, 255, (1, 218, 178, 3), dtype=np.uint8)
    _out, scale, pad = device_resize_pad(jnp.asarray(imgs), (1024, 1024))
    scale = float(scale)
    t, _b, l, _r = (int(x) for x in np.asarray(pad))
    pt = np.array([100.0, 150.0])
    interim_pt = pt * scale + np.array([l, t])
    back = (interim_pt - np.array([l, t])) / scale
    np.testing.assert_allclose(back, pt, rtol=1e-6)
    assert 0 <= interim_pt[0] < 1024 and 0 <= interim_pt[1] < 1024
