"""Strictly-converged sharp-lid Re ladder on the aligned singular kernel.

The first cascade (singular_highre.py) stopped each stage on an energy
plateau of 2e-6/100k steps — too loose for singular-mode spin-up, whose
slowest mode decays with tau ~ Re/4 time units (measured: a Re=1000 rest
start is still 15% under-spun at 12M steps when that test fires). This
driver marches each stage until |dE| < 1e-7 * E per 100k steps for three
consecutive checks, warm-starting the ladder 1000 -> 3200 -> ... so no
stage pays the rest-start transient, and prints Ghia errors per stage.

Usage: python scripts/dev/singular_ladder.py [n] [target_re] [cap_msteps]
States: /tmp/singL_Re{RE}_N{N}.npz (seeded from singrest_Re1000 if present).
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
from anap3_tpu.ops.pallas_aligned import (aligned_supported,
                                          make_aligned_chunk_runner)
from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner
from anap3_tpu.ops.singular import eval_singular_uv

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TARGET = float(sys.argv[2]) if len(sys.argv) > 2 else 10000.0
CAP_M = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0
LADDER = [re for re in (1000.0, 3200.0, 5000.0, 7500.0, 10000.0)
          if re <= TARGET]
CH = 5000
RTOL_E = 1e-7          # |dE|/E per 100k steps
CONSEC = 3


def build(re):
    p = SpectralParameters(Re=re, nx=N, ny=N, dtype="float32",
                           corner_treatment="singular")
    return core.build_spectral_ops(p, dtype=jnp.float32)[0]


def runner_for(ops):
    if aligned_supported(N):
        return make_aligned_chunk_runner(ops, CH, 1e-30, 10,
                                         metrics_every=1)
    m_every = 1 if N <= 192 else 8
    return make_tiled_chunk_runner(ops, min(CH, 2000), 1e-30, 10,
                                   metrics_every=m_every)


def ghia(re, st):
    bx = B.make_basis("chebyshev", (0.0, 1.0))
    xn = bx.nodes(N + 1)
    xc = int(np.argmin(np.abs(xn - 0.5)))
    u_t, v_t = np.asarray(st.u, float), np.asarray(st.v, float)
    gd = Path("/root/repo/data/validation/ghia")
    errs = {}
    for comp in ("u", "v"):
        csv = gd / f"ghia_Re{int(re)}_{comp}_centerline.csv"
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
        diffs = np.abs(vals - tab[comp].to_numpy())[itr]
        srt = np.sort(diffs)[::-1]
        errs[comp] = (srt[0], srt[1])  # max and 2nd-max (Re=3200 u typo)
        print(f"Re={re:g} N={N} LADDER: ghia_{comp}_err = {srt[0]:.4f} "
              f"(2nd {srt[1]:.4f})", flush=True)
    return errs


state = None
seed = Path(f"/tmp/singrest_Re1000_N{N}.npz")
for re in LADDER:
    f = Path(f"/tmp/singL_Re{int(re)}_N{N}.npz")
    src = f if f.exists() else (seed if re == 1000.0 and seed.exists()
                                else None)
    ops = build(re)
    if src is not None:
        d = np.load(src)
        state = core.SpectralState(u=jnp.asarray(d["u"]),
                                   v=jnp.asarray(d["v"]),
                                   p=jnp.asarray(d["p"]))
    if state is None:
        state = core.initial_state(ops)
    state = core.SpectralState(*core.enforce_bc(ops, state.u, state.v),
                               p=state.p)
    runner = runner_for(ops)
    rn = jnp.float32(np.inf)
    it, t0, eprev, hits = 0, time.time(), None, 0
    while it < CAP_M * 1e6:
        for _ in range(100_000 // CH):
            state, done, conv, cv, rows, rn = runner(state, jnp.int32(it),
                                                     rn)
            it += CH
        e = float(np.asarray(rows)[-1, 4])
        if not np.isfinite(e):
            print(f"Re={re:g}: DIVERGED at {it}", flush=True)
            sys.exit(1)
        if eprev is not None and abs(e - eprev) <= RTOL_E * abs(e):
            hits += 1
            if hits >= CONSEC:
                print(f"Re={re:g} N={N}: converged at {it/1e6:.1f}M "
                      f"E={e:.7f} ({time.time()-t0:.0f}s, "
                      f"{it/(time.time()-t0):,.0f} st/s)", flush=True)
                break
        else:
            hits = 0
        eprev = e
        if it % 2_000_000 == 0:
            print(f"  Re={re:g} it={it/1e6:.0f}M E={e:.7f}", flush=True)
    else:
        print(f"Re={re:g} N={N}: CAP at {it/1e6:.0f}M E={e:.7f}",
              flush=True)
    np.savez(f, u=np.asarray(state.u), v=np.asarray(state.v),
             p=np.asarray(state.p))
    ghia(re, state)
