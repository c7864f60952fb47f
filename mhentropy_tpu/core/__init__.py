from mhentropy_tpu.core import camera, mano, rotations, skeletons  # noqa: F401
