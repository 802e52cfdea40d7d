"""Solver models: spectral SG / FSG / VMG / FMG and FV-SIMPLE, plus the
solve harness."""

from .params import Parameters, SpectralParameters, FVParameters, Metrics, TimeSeries, Fields  # noqa: F401

_LAZY = {
    "SGSolver": ("anap3_tpu.models.spectral", "SGSolver"),
    "FSGSolver": ("anap3_tpu.models.spectral", "FSGSolver"),
    "VMGSolver": ("anap3_tpu.models.spectral_vmg", "VMGSolver"),
    "FMGSolver": ("anap3_tpu.models.spectral_vmg", "FMGSolver"),
    "FVSolver": ("anap3_tpu.models.fv", "FVSolver"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
