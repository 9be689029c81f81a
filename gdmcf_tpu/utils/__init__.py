from gdmcf_tpu.utils.logging import MetricLogger
from gdmcf_tpu.utils.profiling import StepTimer, trace

__all__ = ["MetricLogger", "StepTimer", "trace"]
