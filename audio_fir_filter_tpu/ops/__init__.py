from . import df64, fft_core, fft_df64, kernel_design, oracle, overlap_save
from .kernel_design import WindowedSinc
from .overlap_save import (FAST, HIGH, make_plan, same_filter,
                           extended_filter, extended_filter_peak)

__all__ = [
    "df64",
    "fft_core",
    "fft_df64",
    "kernel_design",
    "oracle",
    "overlap_save",
    "WindowedSinc",
    "FAST",
    "HIGH",
    "make_plan",
    "same_filter",
    "extended_filter",
    "extended_filter_peak",
]
