"""Continue a saved singular-mode state with residual-norm monitoring.

The high-Re cascade stops on an energy plateau; this probe marches a saved
state further on the ALIGNED singular kernel and reports both energy and the
true momentum-residual norm per block, to distinguish (a) premature plateau
(residual keeps falling -> keep marching) from (b) an unsteady orbit at
Re past the ~8000 Hopf bifurcation (residual stalls/oscillates at O(1)).

Usage: python scripts/dev/singular_continue.py <Re> <N> <max_msteps> [rtol]
Reads/writes /tmp/singhr_Re{RE}_N{N}.npz.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops import basis as B
from anap3_tpu.ops.pallas_aligned import (aligned_supported,
                                          make_aligned_chunk_runner)
from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner
from anap3_tpu.ops.singular import eval_singular_uv

RE = float(sys.argv[1])
N = int(sys.argv[2])
MAX_M = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
RTOL = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-3
CH = 5000
BLOCK = 500_000

p = SpectralParameters(Re=RE, nx=N, ny=N, dtype="float32",
                       corner_treatment="singular")
ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)
f = f"/tmp/singhr_Re{int(RE)}_N{N}.npz"
d = np.load(f)
st = core.SpectralState(u=jnp.asarray(d["u"]), v=jnp.asarray(d["v"]),
                        p=jnp.asarray(d["p"]))
st = core.SpectralState(*core.enforce_bc(ops, st.u, st.v), p=st.p)

m_every = 1 if N <= 192 else 8
if aligned_supported(N):
    runner = make_aligned_chunk_runner(ops, CH, 1e-30, 10,
                                       metrics_every=m_every)
else:
    runner = make_tiled_chunk_runner(ops, min(CH, 2000), 1e-30, 10,
                                     metrics_every=m_every)

rn = jnp.float32(np.inf)
it = 0
t0 = time.time()
r0 = None
while it < MAX_M * 1e6:
    for _ in range(BLOCK // CH):
        st, done, conv, cv, rows, rn = runner(st, jnp.int32(it), rn)
        it += CH
    r = np.asarray(rows)
    e, ueq, cont = float(r[-1, 4]), float(r[-1, 1]), float(r[-1, 3])
    if r0 is None:
        r0 = ueq
    print(f"Re={RE:g} N={N} it={it/1e6:.1f}M E={e:.6f} "
          f"||R_u||={ueq:.4g} cont={cont:.4g} "
          f"({it/(time.time()-t0):,.0f} st/s)", flush=True)
    if not np.isfinite(e):
        print("DIVERGED", flush=True)
        break
    if ueq < RTOL * r0:
        print(f"residual converged ({ueq:.3g} < {RTOL:g} x {r0:.3g})",
              flush=True)
        break

np.savez(f, u=np.asarray(st.u), v=np.asarray(st.v), p=np.asarray(st.p))

bx = B.make_basis("chebyshev", (0.0, 1.0))
xn = bx.nodes(N + 1)
xc = int(np.argmin(np.abs(xn - 0.5)))
u_t, v_t = np.asarray(st.u, float), np.asarray(st.v, float)
from pathlib import Path
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
        vals = sm + us
    else:
        sm = B.spectral_interpolate(xn, v_t[:, xc], pts)
        _, vs = eval_singular_uv(pts, np.full_like(pts, xn[xc]))
        vals = sm + vs
    err = np.max(np.abs(vals - tab[comp].to_numpy())[itr])
    print(f"Re={RE:g} N={N}: ghia_{comp}_err = {err:.4f}", flush=True)
