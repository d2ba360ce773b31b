from myriad_tpu.serving.engine import Finished, ServingEngine  # noqa: F401
