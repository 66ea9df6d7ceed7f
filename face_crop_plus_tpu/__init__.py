"""face-crop-plus-tpu: TPU-native batch face preprocessing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`face-crop-plus <https://github.com/mantasu/face-crop-plus>`_: face detection
and 5-point-landmark alignment/center-cropping, gated super-resolution
quality enhancement, and 19-class face parsing with attribute grouping and
mask generation — designed TPU-first (fixed shapes, batched device kernels,
data-parallel sharding over a device mesh) rather than ported.
"""

from .cropper import Cropper

__version__ = "0.1.0"
__all__ = ["Cropper", "__version__"]
