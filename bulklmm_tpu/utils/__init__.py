from .config import (
    BALANCED,
    THROUGHPUT,
    DEFAULT_PRECISION,
    EXACT64,
    FAST32,
    MIXED,
    PrecisionConfig,
    default_float,
    enable_x64,
)
from .profiling import timed, trace

__all__ = [
    "BALANCED",
    "THROUGHPUT",
    "DEFAULT_PRECISION",
    "EXACT64",
    "FAST32",
    "MIXED",
    "PrecisionConfig",
    "default_float",
    "enable_x64",
    "timed",
    "trace",
]
