"""Neural models: detection (RetinaFace), enhancement (RRDBNet/BSRGAN x4),
parsing (BiSeNet) — functional JAX inference models with converted weights.
"""

from .detection import RetinaFace
from .enhancement import RRDBNet
from .parsing import BiSeNet

__all__ = ["BiSeNet", "RRDBNet", "RetinaFace"]
