

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
