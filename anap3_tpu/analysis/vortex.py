"""Streamfunction-based vortex detection (Botella & Peyret benchmark metrics).

The reference assembles sparse Laplacians and calls ``spsolve`` per analysis
call (base.py:569-637 for the FD path, sg.py:556-619 for the spectral path).
Here the Dirichlet Poisson solve ∇²ψ = -ω runs through the tensor-product
direct solver (ops.poisson), i.e. four matmuls on device; the arg-extremum
bookkeeping below is one-shot host code.

Vortex conventions carried over exactly (base.py:639-743, sg.py:621-743):
- primary vortex: global minimum of ψ;
- corner vortices BR/BL/TL: maximum of ψ restricted to quadrant masks
  (x≷0.5, y≷0.5), reported only when positive;
- max vorticity: extremum of |ω| with the signed value reported.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..ops.poisson import SeparablePoisson

__all__ = ["solve_streamfunction", "vortex_metrics_from_fields"]


def solve_streamfunction(poisson: SeparablePoisson, omega_2d: np.ndarray) -> np.ndarray:
    """Solve ∇²ψ = -ω with ψ=0 on all boundaries.

    ``omega_2d`` is on the full grid; the solver operates on the interior
    block and the result is re-embedded with zero boundaries.
    """
    rhs = -np.asarray(omega_2d)[1:-1, 1:-1]
    psi_int = np.asarray(poisson.solve(rhs))
    psi = np.zeros_like(np.asarray(omega_2d))
    psi[1:-1, 1:-1] = psi_int
    return psi


def vortex_metrics_from_fields(
    psi_2d: np.ndarray,
    omega_2d: np.ndarray,
    X: np.ndarray,
    Y: np.ndarray,
) -> Dict[str, float]:
    """All vortex metrics from ψ, ω and matching coordinate arrays (same shape)."""
    psi_2d = np.asarray(psi_2d)
    omega_2d = np.asarray(omega_2d)

    # Primary vortex: global min of psi
    min_idx = np.unravel_index(np.argmin(psi_2d), psi_2d.shape)
    out = {
        "psi_min": float(psi_2d[min_idx]),
        "psi_min_x": float(X[min_idx]),
        "psi_min_y": float(Y[min_idx]),
        "omega_center": float(omega_2d[min_idx]),
    }

    # Max |vorticity| (signed value reported)
    max_idx = np.unravel_index(np.argmax(np.abs(omega_2d)), omega_2d.shape)
    out.update(
        omega_max=float(omega_2d[max_idx]),
        omega_max_x=float(X[max_idx]),
        omega_max_y=float(Y[max_idx]),
    )

    # Secondary corner vortices (psi > 0 in quadrant masks)
    regions = {
        "BR": (X > 0.5) & (Y < 0.5),
        "BL": (X < 0.5) & (Y < 0.5),
        "TL": (X < 0.5) & (Y > 0.5),
    }
    for name, mask in regions.items():
        masked = np.where(mask, psi_2d, -np.inf)
        idx = np.unravel_index(np.argmax(masked), psi_2d.shape)
        val = psi_2d[idx]
        if val > 0:
            out[f"psi_{name}"] = float(val)
            out[f"omega_{name}"] = float(omega_2d[idx])
            out[f"psi_{name}_x"] = float(X[idx])
            out[f"psi_{name}_y"] = float(Y[idx])
        else:
            out[f"psi_{name}"] = 0.0
            out[f"omega_{name}"] = 0.0
            out[f"psi_{name}_x"] = 0.0
            out[f"psi_{name}_y"] = 0.0
    return out
