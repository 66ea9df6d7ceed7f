"""Probe: which Pallas/Mosaic gathers compile on the current TPU toolchain.

The exact Pallas warp kernel (a per-pixel bilinear sample = 2D gather from
a source window) is blocked on Mosaic's gather lowering.  This probe maps
the current support boundary so each round can re-check in one command:

    python tools/mosaic_gather_probe.py

Findings as of 2026-08-18 (v5e, tunneled toolchain):

* ``jnp.take_along_axis`` along axis 0 compiles and runs *exactly* only
  when the sublane dimension is exactly 8 (one native register tile row
  count); the lane dimension may span multiple 128-lane tiles (8x256,
  8x512 OK).  Indices therefore select among just 8 rows.
* Along axis 1 it works only at exactly (8, 128) — indices confined to a
  single native register's lanes.
* Everything larger crashes the backend (``tpu_compile_helper`` exit 1,
  HTTP 500 from the remote compile helper) — the front end accepts it.

Implication: gathers are supported only *within one native (8, 128)
register tile dimension*.  An arbitrary-window warp would need the row
select decomposed into an 8-way vector select over row groups plus an
in-group axis-0 gather, and has no path at all for arbitrary column
selects — not worth the complexity while the fused detect program is
detector-conv-bound (see STATUS.md).  Re-run this after toolchain
updates; if the big shapes start passing, the warp kernel unblocks.
"""

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print("devices:", jax.devices())

    def probe(h: int, w: int, axis: int) -> str:
        def kern(idx_ref, src_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(
                src_ref[...], idx_ref[...], axis=axis
            )

        hi = h if axis == 0 else w
        idx = np.random.randint(0, hi, (h, w)).astype(np.int32)
        src = np.random.rand(h, w).astype(np.float32)
        f = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32)
        )
        try:
            out = np.asarray(jax.jit(f)(jnp.asarray(idx), jnp.asarray(src)))
            ok = np.array_equal(out, np.take_along_axis(src, idx, axis=axis))
            return f"OK exact={ok}"
        except Exception as e:  # MosaicError and friends
            return f"FAIL {type(e).__name__}"

    cases = [
        # axis 0 (row select): sublane dim must be 8
        (8, 128, 0), (8, 256, 0), (8, 512, 0),
        (16, 128, 0), (64, 128, 0), (256, 256, 0),
        # axis 1 (lane select): only one native 128-lane register
        (8, 128, 1), (8, 256, 1), (16, 256, 1), (256, 256, 1),
    ]
    for h, w, axis in cases:
        print(f"take_along_axis {h}x{w} axis{axis}: {probe(h, w, axis)}")


if __name__ == "__main__":
    main()
