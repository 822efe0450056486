from deft_tpu.obs.logger import create_logger
from deft_tpu.obs.timers import GlobalTimer
from deft_tpu.obs.perf_metrics import PerfMetrics

__all__ = ["create_logger", "GlobalTimer", "PerfMetrics"]
