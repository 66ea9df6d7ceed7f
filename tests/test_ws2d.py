"""W-only space-to-depth + source-grouped trunk: exact-equivalence tests.

The production TPU trunk (``trunk_mode="ws2d"``) composes two exact
rewrites — W-axis space-to-depth (channel doubling) and source-grouping of
the dense-block convs — so, like test_s2d.py, these check tight float32
agreement with the plain trunk on CPU, plus the shape gating and the
enhancer-level dispatch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from face_crop_plus_tpu.models.enhancement import (
    RRDBNet,
    make_ws2d_grouped_trunk_params,
    rrdbnet_forward,
    rrdbnet_forward_ws2d,
)
from face_crop_plus_tpu.ops.nn import Params, conv2d
from face_crop_plus_tpu.ops.s2d import (
    depth_to_space_w,
    s2dw_bias,
    s2dw_conv_weight,
    space_to_depth_w,
)


def test_ws2d_roundtrip_and_layout():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 8, 3)).astype(np.float32)  # odd H is fine
    y = space_to_depth_w(jnp.asarray(x))
    assert y.shape == (2, 5, 4, 6)
    y_np = np.asarray(y)
    for dj in (0, 1):
        np.testing.assert_array_equal(y_np[:, 3, 2, 1 * 2 + dj], x[:, 3, 4 + dj, 1])
    np.testing.assert_array_equal(np.asarray(depth_to_space_w(y)), x)


def test_ws2d_single_conv_equivalence():
    """Core lemma: s2dw(conv(x, W)) == conv(s2dw(x), W') incl. borders."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 7, 6, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 5)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)

    p = Params({"c.weight": jnp.asarray(w), "c.bias": jnp.asarray(b)})
    ref = conv2d(p, "c", jnp.asarray(x), 5, bias=True)

    p2 = Params(
        {
            "c.weight": jnp.asarray(s2dw_conv_weight(w)),
            "c.bias": jnp.asarray(s2dw_bias(b)),
        }
    )
    got = depth_to_space_w(conv2d(p2, "c", space_to_depth_w(jnp.asarray(x)), 10, bias=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5)


def _tiny_params(num_blocks):
    p = Params(rng=np.random.default_rng(3))
    rrdbnet_forward(p, jnp.zeros((1, 8, 8, 3), jnp.float32), num_blocks)
    return p


def test_ws2d_forward_equivalence():
    nb = 2
    p = _tiny_params(nb)
    pg = Params(
        {
            k: jnp.asarray(v, jnp.float32)
            for k, v in make_ws2d_grouped_trunk_params(
                {k: np.asarray(v) for k, v in p.data.items()}, nb
            ).items()
        }
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(size=(2, 9, 12, 3)).astype(np.float32))  # odd H
    ref = rrdbnet_forward(p, x, nb)
    got = rrdbnet_forward_ws2d(p, pg, x, nb)
    assert got.shape == ref.shape == (2, 36, 48, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=2e-4)


@pytest.mark.parametrize(
    "mode,h,w,expected",
    [
        ("ws2d", 10, 10, "ws2d"),
        ("ws2d", 11, 10, "ws2d"),  # odd H fine: only W must be even
        ("ws2d", 10, 11, "plain"),
        ("s2d", 10, 10, "s2d"),
        ("s2d", 11, 10, "plain"),
        ("plain", 10, 10, "plain"),
    ],
)
def test_mode_for_shape(mode, h, w, expected):
    m = RRDBNet(num_blocks=1, trunk_mode=mode)
    assert m._mode_for_shape(h, w) == (expected, None)


def test_enhancer_ws2d_matches_plain_end_to_end():
    """uint8-in/uint8-out predict parity between trunk modes (CPU f32)."""
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (2, 10, 12, 3), np.uint8)
    a = RRDBNet(num_blocks=1, trunk_mode="plain", compute_dtype=jnp.float32)
    b = RRDBNet(num_blocks=1, trunk_mode="ws2d", compute_dtype=jnp.float32)
    out_a = a.enhance_images(imgs)
    out_b = b.enhance_images(imgs)
    # Identical up to the final uint8 rounding of reassociated float sums.
    assert np.mean(np.abs(out_a.astype(int) - out_b.astype(int)) > 1) < 0.01


def test_trunk_mode_validation_and_alias():
    with pytest.raises(ValueError):
        RRDBNet(num_blocks=1, trunk_mode="nope")
    m = RRDBNet(num_blocks=1, use_s2d=True)
    assert m.trunk_mode == "s2d" and m.use_s2d


def test_ws2d_size_ceiling_switches_to_strips():
    """Above the unstripped pixel budget, ws2d engages H-strips (r3: the
    1024² detect interim keeps the fast trunk instead of falling back)."""
    m = RRDBNet(num_blocks=1, trunk_mode="ws2d")
    assert m._mode_for_shape(512, 512) == ("ws2d", None)
    mode, rows = m._mode_for_shape(1024, 1024)
    assert mode == "ws2d" and rows is not None
    assert 32 <= rows <= 512 and rows % 8 == 0
    # Strip rows scale with the budget: a larger budget means fewer strips.
    m.ws2d_max_pixels = 1024 * 1024
    assert m._mode_for_shape(1024, 1024) == ("ws2d", None)


def test_ws2d_pathological_width_falls_back_to_plain():
    """When even the minimum 32-row strip busts the strip budget (very wide
    inputs), ws2d falls back to the plain trunk instead of silently
    exceeding the HBM budget the stripping exists to enforce."""
    m = RRDBNet(num_blocks=1, trunk_mode="ws2d")
    w = m.ws2d_strip_pixels // 32 + 2  # even; 32 rows alone exceed budget
    if w % 2:
        w += 1
    mode, rows = m._mode_for_shape(64, w)
    assert (mode, rows) == ("plain", None)
    # At exactly the budget the stripped path still engages.
    w_ok = m.ws2d_strip_pixels // 32
    if w_ok % 2:
        w_ok -= 1
    mode, rows = m._mode_for_shape(128, w_ok)  # far above unstripped budget
    assert mode == "ws2d" and rows is not None


def test_ws2d_strips_forward_equivalence():
    """Stripped dense blocks are exact vs the unstripped ws2d trunk,
    including top/bottom image edges, odd H, and a non-dividing strip."""
    from face_crop_plus_tpu.models.enhancement import _DENSE_HALO

    nb = 2
    p = _tiny_params(nb)
    pg = Params(
        {
            k: jnp.asarray(v, jnp.float32)
            for k, v in make_ws2d_grouped_trunk_params(
                {k: np.asarray(v) for k, v in p.data.items()}, nb
            ).items()
        }
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(1, 45, 16, 3)).astype(np.float32))
    ref = rrdbnet_forward_ws2d(p, pg, x, nb)
    for rows in (12, 16, 45 - 2 * _DENSE_HALO - 1):
        got = rrdbnet_forward_ws2d(p, pg, x, nb, strip_rows=rows)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=2e-4,
            err_msg=f"strip_rows={rows}",
        )
    # strip_rows >= H - 2*halo: the strips helper takes the single-pass path.
    got = rrdbnet_forward_ws2d(p, pg, x, nb, strip_rows=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=2e-4)


def test_enhancer_strips_end_to_end_matches_plain():
    """enhance_images with a strip-forcing budget matches the plain trunk."""
    rng = np.random.default_rng(8)
    imgs = rng.integers(0, 255, (1, 64, 12, 3), np.uint8)
    a = RRDBNet(num_blocks=1, trunk_mode="plain", compute_dtype=jnp.float32)
    b = RRDBNet(num_blocks=1, trunk_mode="ws2d", compute_dtype=jnp.float32)
    b.ws2d_max_pixels = 12 * 12  # force the stripped path
    b.ws2d_strip_pixels = 32 * 12  # rows_max = 32 -> 2 strips of 32
    mode, rows = b._mode_for_shape(64, 12)
    assert mode == "ws2d" and rows == 32
    out_a = a.enhance_images(imgs)
    out_b = b.enhance_images(imgs)
    assert np.mean(np.abs(out_a.astype(int) - out_b.astype(int)) > 1) < 0.01
