

def test_bilinear_align_corners_single_output_matches_torch():
    import numpy as np
    import torch
    import torch.nn.functional as F

    import jax.numpy as jnp

    from face_crop_plus_tpu.ops.nn import resize_bilinear

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 17, 13, 3)).astype(np.float32)
    want = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(1, 1),
            mode="bilinear", align_corners=True,
        ).numpy().transpose(0, 2, 3, 1)
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), (1, 1), align_corners=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_bilinear_folded_pad_matches_jnp_pad():
    import numpy as np

    import jax.numpy as jnp

    from face_crop_plus_tpu.ops.nn import resize_bilinear

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 255, (2, 21, 17, 3)).astype(np.float32))
    for size, pad in (((40, 32), ((4, 6), (2, 1))), ((10, 54), ((0, 0), (5, 0)))):
        want = jnp.pad(
            resize_bilinear(x, size),
            ((0, 0), pad[0], pad[1], (0, 0)),
        )
        got = resize_bilinear(x, size, pad=pad)
        # Interp rows: same math, but the enlarged matmul may tile (and so
        # reassociate) differently — tight band, not bit equality.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-6
        )
        # The folded borders themselves are structurally zero rows: exact.
        t, b = pad[0]
        l, r = pad[1]
        g = np.asarray(got)
        if t:
            np.testing.assert_array_equal(g[:, :t], 0)
        if b:
            np.testing.assert_array_equal(g[:, -b:], 0)
        if l:
            np.testing.assert_array_equal(g[:, :, :l], 0)
        if r:
            np.testing.assert_array_equal(g[:, :, -r:], 0)
