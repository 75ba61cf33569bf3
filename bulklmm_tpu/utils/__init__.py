from .config import DEFAULT_PRECISION, PrecisionConfig, default_float, enable_x64

__all__ = ["DEFAULT_PRECISION", "PrecisionConfig", "default_float", "enable_x64"]
