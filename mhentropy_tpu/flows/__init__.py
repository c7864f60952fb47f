from mhentropy_tpu.flows import priors, realnvp  # noqa: F401
