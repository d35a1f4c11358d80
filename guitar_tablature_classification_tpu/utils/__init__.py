from .logging import MetricsLogger
from .prng import KeySequence, set_seed
from .profiling import ThroughputMeter, trace

__all__ = ["KeySequence", "MetricsLogger", "ThroughputMeter", "set_seed", "trace"]
