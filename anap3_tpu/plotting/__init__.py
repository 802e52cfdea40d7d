"""Plot generation for LDC runs (reference src/shared/plotting/ldc).

Artifact contract matches the reference orchestrator exactly:
convergence.pdf, vorticity.pdf, ghia_comparison.pdf per run plus
u.png / v.png / pressure.png / vel-mag.png / streamlines.png field renders,
and per-sweep ghia_comparison.pdf + l2_convergence_{u,v}[_regu].pdf on the
parent run. PyVista/VTK off-screen rendering is replaced with matplotlib
(no VTK in this image — and no need for the reference's subprocess crash
isolation, pyvista_fields.py:133-161, since matplotlib cannot segfault the
solver process; a density-fallback retry for streamlines is kept).
"""

from .orchestrator import generate_plots_for_run, generate_comparison_plots_for_sweep  # noqa: F401
