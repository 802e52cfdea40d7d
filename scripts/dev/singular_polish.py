"""N=256 polish of saved singular-mode states + steadiness classification.

Prolongates /tmp/singhr_Re{RE}_N128.npz to N=256 (or resumes a saved 256
state), marches on the aligned singular kernel, and every block records the
v-centerline so the run can be classified:

- steady: successive centerline snapshots contract (max drift -> f32 floor)
- orbit (expected past the ~Re 8000 Hopf bifurcation): drift stalls at a
  finite oscillation amplitude

Usage: python scripts/dev/singular_polish.py <Re> [max_msteps]
"""
import sys
import time
from pathlib import Path

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
from anap3_tpu.ops.pallas_aligned import make_aligned_chunk_runner
from anap3_tpu.ops.singular import eval_singular_uv
from anap3_tpu.ops.transfer import (make_transfer_matrices,
                                    nodal_interpolation_matrix)

RE = float(sys.argv[1])
MAX_M = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
NC, NF = 128, 256
CH = 5000
BLOCK = 1_000_000

p = SpectralParameters(Re=RE, nx=NF, ny=NF, dtype="float32",
                       corner_treatment="singular")
ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)

ff = Path(f"/tmp/singhr_Re{int(RE)}_N{NF}.npz")
if ff.exists():
    d = np.load(ff)
    st = core.SpectralState(u=jnp.asarray(d["u"]), v=jnp.asarray(d["v"]),
                            p=jnp.asarray(d["p"]))
else:
    d = np.load(f"/tmp/singhr_Re{int(RE)}_N{NC}.npz")
    P_full, _ = make_transfer_matrices(NC + 1, NF + 1, "fft", "fft")
    bx = B.make_basis("chebyshev", (0.0, 1.0))
    P_inner = nodal_interpolation_matrix(bx.nodes(NC + 1)[1:-1],
                                         bx.nodes(NF + 1)[1:-1])
    Pf = jnp.asarray(P_full, jnp.float32)
    Pi = jnp.asarray(P_inner, jnp.float32)
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    st = core.SpectralState(
        u=mm(mm(Pf, jnp.asarray(d["u"])), Pf.T),
        v=mm(mm(Pf, jnp.asarray(d["v"])), Pf.T),
        p=mm(mm(Pi, jnp.asarray(d["p"])), Pi.T))
st = core.SpectralState(*core.enforce_bc(ops, st.u, st.v), p=st.p)

runner = make_aligned_chunk_runner(ops, CH, 1e-30, 10, metrics_every=8)
bx = B.make_basis("chebyshev", (0.0, 1.0))
xn = bx.nodes(NF + 1)
xc = int(np.argmin(np.abs(xn - 0.5)))

rn = jnp.float32(np.inf)
it = 0
t0 = time.time()
prev = None
while it < MAX_M * 1e6:
    for _ in range(BLOCK // CH):
        st, done, conv, cv, rows, rn = runner(st, jnp.int32(it), rn)
        it += CH
    r = np.asarray(rows)
    e = float(r[-1, 4])
    vline = np.asarray(st.v, float)[:, xc]
    drift = np.nan if prev is None else float(np.max(np.abs(vline - prev)))
    prev = vline
    print(f"Re={RE:g} N={NF} it={it/1e6:.1f}M E={e:.6f} "
          f"centerline_drift/{BLOCK//1000}k={drift:.3e} "
          f"({it/(time.time()-t0):,.0f} st/s)", flush=True)
    if not np.isfinite(e):
        print("DIVERGED", flush=True)
        break

np.savez(ff, u=np.asarray(st.u), v=np.asarray(st.v), p=np.asarray(st.p))
u_t, v_t = np.asarray(st.u, float), np.asarray(st.v, float)
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
    print(f"Re={RE:g} N={NF}: ghia_{comp}_err = {err:.4f}", flush=True)
