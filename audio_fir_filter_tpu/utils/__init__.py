from .errors import DiskerrorError, FileExists, FileNotFound, StopNoError, UsageError
from .options import FilterOptions
from .progress import ProgressBar, ThreadSafeProgress

__all__ = [
    "DiskerrorError",
    "FileExists",
    "FileNotFound",
    "StopNoError",
    "UsageError",
    "FilterOptions",
    "ProgressBar",
    "ThreadSafeProgress",
]
