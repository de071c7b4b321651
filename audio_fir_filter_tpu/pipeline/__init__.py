from .process_file import process_file
from .stream import filter_array_streamed

__all__ = ["process_file", "filter_array_streamed"]
