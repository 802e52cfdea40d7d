"""Solver models: spectral SG / FSG and FV-SIMPLE, plus the solve harness."""

from .params import Parameters, SpectralParameters, FVParameters, Metrics, TimeSeries, Fields  # noqa: F401
