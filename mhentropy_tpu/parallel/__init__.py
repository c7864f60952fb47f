from mhentropy_tpu.parallel import mesh  # noqa: F401
