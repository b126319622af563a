from .compile_cache import enable_compile_cache
from .device_guard import guard_device_acquisition

__all__ = ["enable_compile_cache", "guard_device_acquisition"]
