"""Selective frequency damping: converge UNSTABLE steady states (Re >= ~8000).

The lid-driven-cavity steady solution loses stability at a Hopf bifurcation
near Re ~ 8000; past it a pseudo-time marcher orbits the limit cycle instead
of converging, which is the leading suspect for the Re=10000 v-centerline
residual vs Ghia's (steady-solver) table. SFD (Akervik et al. 2006) recovers
the unstable fixed point from a time-marcher by damping frequencies above a
low-pass filter:

    du/dtau = NS(u) - chi (u - u_bar),   du_bar/dtau = (u - u_bar) / Delta

At the fixed point u == u_bar, so the forcing vanishes and the converged
state solves the UNFORCED steady equations. The forcing rides sg_step's tau
hook (the same per-stage additive forcing the FAS V-cycle uses).

Usage: python scripts/dev/sfd_probe.py <Re> <N> [chi] [Delta] [max_msteps]
Warm-starts from /tmp/singhr_Re{RE}_N{N}.npz (singular mode), writes
/tmp/sfd_Re{RE}_N{N}.npz. Convergence indicator: ||u - u_bar|| -> 0.
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
from functools import partial

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops import basis as B
from anap3_tpu.ops.singular import eval_singular_uv

RE = float(sys.argv[1])
N = int(sys.argv[2])
CHI = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
DELTA = float(sys.argv[4]) if len(sys.argv) > 4 else 1.1
MAX_M = float(sys.argv[5]) if len(sys.argv) > 5 else 10.0
CH = 1000

p = SpectralParameters(Re=RE, nx=N, ny=N, dtype="float32",
                       corner_treatment="singular")
ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)

src = Path(f"/tmp/singhr_Re{int(RE)}_N{N}.npz")
d = np.load(src)
st = core.SpectralState(u=jnp.asarray(d["u"]), v=jnp.asarray(d["v"]),
                        p=jnp.asarray(d["p"]))
st = core.SpectralState(*core.enforce_bc(ops, st.u, st.v), p=st.p)
bar = (st.u, st.v)

chi = jnp.float32(CHI)
inv_delta = jnp.float32(1.0 / DELTA)
zp = jnp.zeros_like(st.p)


@partial(jax.jit, static_argnums=())
def sfd_chunk(st, bar_u, bar_v):
    def body(carry, _):
        s, bu, bv = carry
        tau = (-chi * (s.u - bu), -chi * (s.v - bv), zp)
        s2, m = core.sg_step(ops, s, tau=tau)
        dt = core.adaptive_dt(ops, s.u, s.v)
        a = dt * inv_delta
        bu2 = bu + a * (s2.u - bu)
        bv2 = bv + a * (s2.v - bv)
        return (s2, bu2, bv2), None

    (s, bu, bv), _ = jax.lax.scan(body, (st, bar_u, bar_v), None, length=CH)
    gap = jnp.sqrt(jnp.sum((s.u - bu) ** 2) + jnp.sum((s.v - bv) ** 2))
    _, m = core.sg_step(ops, s)  # unforced residual norms at this state
    return s, bu, bv, gap, m["u_eq"], m["energy"]


bx = B.make_basis("chebyshev", (0.0, 1.0))
xn = bx.nodes(N + 1)
xc = int(np.argmin(np.abs(xn - 0.5)))

it = 0
t0 = time.time()
prev = None
while it < MAX_M * 1e6:
    for _ in range(100_000 // CH):
        st, bu, bv, gap, ueq, e = sfd_chunk(st, *bar)
        bar = (bu, bv)
        it += CH
    vline = np.asarray(st.v, float)[:, xc]
    drift = np.nan if prev is None else float(np.max(np.abs(vline - prev)))
    prev = vline
    print(f"Re={RE:g} N={N} it={it/1e6:.2f}M E={float(e):.6f} "
          f"||u-ubar||={float(gap):.3e} drift/100k={drift:.3e} "
          f"({it/(time.time()-t0):,.0f} st/s)", flush=True)
    if not np.isfinite(float(e)):
        print("DIVERGED", flush=True)
        break
    if float(gap) < 1e-5:
        print("SFD converged: forcing vanished", flush=True)
        break

np.savez(f"/tmp/sfd_Re{int(RE)}_N{N}.npz", u=np.asarray(st.u),
         v=np.asarray(st.v), p=np.asarray(st.p))

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
    print(f"Re={RE:g} N={N} SFD: ghia_{comp}_err = {err:.4f}", flush=True)
