from emdr2_tpu.utils.timers import Timers  # noqa: F401
