from .logger import Logger, MetricLogger
from .timing import EpochTimer, PhaseTimer, op_time, time_fn

__all__ = ["Logger", "MetricLogger", "EpochTimer", "PhaseTimer", "op_time", "time_fn"]
