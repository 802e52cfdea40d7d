"""Field renders: vorticity contours + u/v/pressure/|u|/streamline images.

Replaces both the reference's matplotlib field plots (fields.py:20-210) and
its PyVista off-screen renders (pyvista_fields.py). The reference isolates
streamline rendering in a subprocess with timeout + density fallbacks because
VTK can segfault (pyvista_fields.py:133-161); matplotlib's streamplot cannot
crash the process, so only the density-fallback retry is kept.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
from scipy.interpolate import RectBivariateSpline

from . import style  # noqa: F401
import matplotlib.pyplot as plt

from .data_loading import restructure_fields

log = logging.getLogger(__name__)

__all__ = ["plot_vorticity", "generate_field_plots"]


def _resample(x, y, F, n=200):
    """Spline resample onto a uniform grid (needed for non-uniform CGL grids)."""
    xi = np.linspace(x.min(), x.max(), n)
    yi = np.linspace(y.min(), y.max(), n)
    spline = RectBivariateSpline(y, x, F)
    return xi, yi, spline(yi, xi)


def plot_vorticity(fields: dict, Re, solver_name, N, output_dir) -> Path:
    """Filled vorticity contours -> vorticity.pdf (reference fields.py)."""
    x, y, U, V, _ = restructure_fields(fields)
    xi, yi, Ui = _resample(x, y, U)
    _, _, Vi = _resample(x, y, V)
    dx = xi[1] - xi[0]
    dy = yi[1] - yi[0]
    omega = np.gradient(Vi, dx, axis=1) - np.gradient(Ui, dy, axis=0)
    fig, ax = plt.subplots(figsize=(6.5, 6))
    levels = np.linspace(-5, 5, 41)
    cs = ax.contourf(xi, yi, np.clip(omega, -5, 5), levels=levels, cmap="RdBu_r")
    ax.contour(xi, yi, omega, levels=[-3, -2, -1, 0, 1, 2, 3], colors="k",
               linewidths=0.4, alpha=0.5)
    fig.colorbar(cs, ax=ax, label=r"$\omega$")
    ax.set_aspect("equal")
    ax.set_xlabel("$x$")
    ax.set_ylabel("$y$")
    ax.set_title(f"Vorticity: {solver_name}, $N={N}$, $Re={Re:g}$")
    out = Path(output_dir) / "vorticity.pdf"
    fig.savefig(out)
    plt.close(fig)
    return out


def generate_field_plots(fields: dict, output_dir) -> dict:
    """u.png, v.png, pressure.png, vel-mag.png, streamlines.png."""
    output_dir = Path(output_dir)
    x, y, U, V, P = restructure_fields(fields)
    xi, yi, Ui = _resample(x, y, U)
    _, _, Vi = _resample(x, y, V)
    _, _, Pi = _resample(x, y, P)
    mag = np.sqrt(Ui**2 + Vi**2)

    out: dict = {}

    def render(name, F, cmap, label):
        fig, ax = plt.subplots(figsize=(6, 5.5))
        im = ax.pcolormesh(xi, yi, F, cmap=cmap, shading="auto")
        fig.colorbar(im, ax=ax, label=label)
        ax.set_aspect("equal")
        ax.set_xlabel("$x$")
        ax.set_ylabel("$y$")
        path = output_dir / f"{name}.png"
        fig.savefig(path, dpi=200)
        plt.close(fig)
        out[name] = path

    render("u", Ui, "RdBu_r", "$u$")
    render("v", Vi, "RdBu_r", "$v$")
    render("pressure", Pi, "viridis", "$p$")
    render("vel-mag", mag, "magma", r"$|\mathbf{u}|$")

    # streamlines with density fallback (mirrors pyvista_fields fallbacks)
    for density in (2.0, 1.2, 0.7):
        try:
            fig, ax = plt.subplots(figsize=(6, 5.5))
            ax.streamplot(xi, yi, Ui, Vi, density=density, color=mag,
                          cmap="magma", linewidth=0.8)
            ax.set_aspect("equal")
            ax.set_xlim(xi.min(), xi.max())
            ax.set_ylim(yi.min(), yi.max())
            ax.set_xlabel("$x$")
            ax.set_ylabel("$y$")
            path = output_dir / "streamlines.png"
            fig.savefig(path, dpi=200)
            plt.close(fig)
            out["streamlines"] = path
            break
        except Exception as exc:
            plt.close("all")
            log.warning("Streamline render failed at density %s: %s", density, exc)
    return out
