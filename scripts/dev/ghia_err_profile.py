"""Point-by-point Ghia centerline error profile for a saved singular state.

Shows WHERE the high-Re centerline error lives (near-wall peaks vs interior),
to distinguish spatial under-resolution / under-converged marching / Ghia's
own coarse-grid error. Host-side only (CPU).

Usage: python scripts/dev/ghia_err_profile.py <state.npz> <Re> <N>
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

from anap3_tpu.ops import basis as B
from anap3_tpu.ops.singular import eval_singular_uv

path, RE, N = sys.argv[1], float(sys.argv[2]), int(sys.argv[3])
d = np.load(path)
u_t, v_t = np.asarray(d["u"], float), np.asarray(d["v"], float)

xn = B.make_basis("chebyshev", (0.0, 1.0)).nodes(N + 1)
xc = int(np.argmin(np.abs(xn - 0.5)))
print(f"centerline at x={xn[xc]:.6f} (node {xc})")
gd = Path("/root/repo/data/validation/ghia")
for comp in ("u", "v"):
    csv = gd / f"ghia_Re{int(RE)}_{comp}_centerline.csv"
    if not csv.exists():
        continue
    tab = pd.read_csv(csv)
    coord = "y" if comp == "u" else "x"
    pts = tab[coord].to_numpy()
    itr = (pts > 1e-6) & (pts < 1 - 1e-6)
    if comp == "u":
        sm = B.spectral_interpolate(xn, u_t[xc, :], pts)
        us, _ = eval_singular_uv(np.full_like(pts, xn[xc]), pts)
        vals = np.asarray(sm) + us
    else:
        sm = B.spectral_interpolate(xn, v_t[:, xc], pts)
        _, vs = eval_singular_uv(pts, np.full_like(pts, xn[xc]))
        vals = np.asarray(sm) + vs
    ref = tab[comp].to_numpy()
    print(f"--- {comp} centerline ({csv.name}) ---")
    for i in np.where(itr)[0]:
        mark = " <<<" if abs(vals[i] - ref[i]) > 0.05 else ""
        print(f"  {coord}={pts[i]:.4f}  ghia={ref[i]:+.4f}  "
              f"ours={vals[i]:+.4f}  err={abs(vals[i]-ref[i]):.4f}{mark}")
