from mhentropy_tpu.models import mhent, resnet  # noqa: F401
