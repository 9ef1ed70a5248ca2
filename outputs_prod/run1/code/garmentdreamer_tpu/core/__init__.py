"""Core utilities: config, cameras, artifact I/O, profiling."""

from garmentdreamer_tpu.core.config import C, C_max, Config, load_config, parse_dotlist
from garmentdreamer_tpu.core import cameras, io
from garmentdreamer_tpu.core.profiler import NoOpProfiler, Profiler, get_profiler

__all__ = [
    "C",
    "C_max",
    "Config",
    "load_config",
    "parse_dotlist",
    "cameras",
    "io",
    "Profiler",
    "NoOpProfiler",
    "get_profiler",
]
