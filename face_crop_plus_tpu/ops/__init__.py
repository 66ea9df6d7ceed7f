from .transform import estimate_affine, estimate_similarity, invert_affine
from .warp import BORDER_MODES, to_uint8, warp_affine_batch

__all__ = [
    "BORDER_MODES",
    "estimate_affine",
    "estimate_similarity",
    "invert_affine",
    "to_uint8",
    "warp_affine_batch",
]
