from mhentropy_tpu.data import synthetic  # noqa: F401
