from .fir import BandPass, BandReject, FIRFilter, HighPass, LowCut, LowPass

__all__ = ["FIRFilter", "LowCut", "HighPass", "LowPass", "BandPass", "BandReject"]
