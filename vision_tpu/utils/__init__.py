from .profiling import Timer, trace
from .dump import dump_captures, compare_dumps

__all__ = ["Timer", "trace", "dump_captures", "compare_dumps"]
