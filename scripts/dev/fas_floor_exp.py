#!/usr/bin/env python
"""FAS-variant experiment harness behind the VMG resolution floor.

This is the round-3 calibration harness for spectral_vmg.py's
FAS_RESOLUTION_COEFF: it reproduces the round-2 "biased attractor"
(e.g. ``python fas_floor_exp.py 48 100 truth,base``), demonstrates the
unbiased 2-level cycles within the floor (``48 100 truth,lvl2``;
``192 1000 lvl2 40000``), and carries the variants that FALSIFIED the
alternative explanations — results quoted in STATUS.md and the
FAS_RESOLUTION_COEFF docstring:

  base     : production-equivalent cycle over the full hierarchy
  ep0      : pressure correction zeroed            -> diverges
  cvg      : coarsest solved inexact-Newton style to 5% of the
             incoming defect (lax.while_loop)      -> diverges below
             the floor (the forced coarse problem's solution really is
             far from the restricted fine state)
  cvg_ep0  : both                                  -> diverges
  ls / ls2 : Armijo line search on the correction  -> rejects nearly
             every under-floor correction (they objectively increase
             the fine defect); crawls, no bias
  proj2    : spectral-truncation state restriction -> identical to
             injection (restriction choice is not the mechanism)
  lvl2     : truncate the hierarchy to 2 levels    -> converges
             unbiased wherever the coarse level meets the floor
  diag1    : tau-magnitude diagnostics down the hierarchy
  warm*    : 20k-step warm starts (basin probes)

Usage: python fas_floor_exp.py <N> <Re> <variants-comma-list> [n_cycles]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.models.spectral_vmg import build_vmg_levels, _zero_boundary

_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST)


def make_cycle(levels, nu1=2, nu2=2, nu_coarse=30, damping=1.0,
               ep0=False, coarse_converge=False, coarse_frac=0.05,
               coarse_cap=20000, state_restrict="inj", diag=False,
               line_search=False):
    def smooth(idx, state, tau, n_steps):
        level = levels[idx]

        def body(s, _):
            return core.sg_step(level.ops, s, tau=tau)

        state, ms = jax.lax.scan(body, state, None, length=n_steps)
        return state, jax.tree.map(lambda x: x[-1], ms)

    def coarse_solve(idx, state, tau):
        """March the forced coarse problem until its (interior) residual
        drops to coarse_frac of the entry value, capped at coarse_cap."""
        level = levels[idx]

        def forced_norm(s):
            R_u, R_v, R_p = core.residuals(level.ops, s.u, s.v, s.p)
            R_u = _zero_boundary(R_u + tau[0])
            R_v = _zero_boundary(R_v + tau[1])
            R_p = R_p + tau[2]
            return jnp.sqrt(jnp.sum(R_u**2) + jnp.sum(R_v**2)
                            + jnp.sum(R_p**2))

        r0 = forced_norm(state)
        target = coarse_frac * r0

        def cond(carry):
            s, k, r = carry
            return (k < coarse_cap) & (r > target) & jnp.isfinite(r)

        def body(carry):
            s, k, r = carry
            def one(ss, _):
                ss2, _m = core.sg_step(level.ops, ss, tau=tau)
                return ss2, ()
            s, _ = jax.lax.scan(one, s, None, length=25)
            return (s, k + 25, forced_norm(s))

        state, k, r = jax.lax.while_loop(cond, body, (state, jnp.int32(0), r0))
        return state, k

    def defect(level, state, tau):
        R_u, R_v, R_p = core.residuals(level.ops, state.u, state.v, state.p)
        if tau is not None:
            R_u, R_v, R_p = R_u + tau[0], R_v + tau[1], R_p + tau[2]
        return R_u, R_v, R_p

    def cycle(idx, state, tau):
        level = levels[idx]
        if idx == len(levels) - 1:
            if coarse_converge:
                state, k = coarse_solve(idx, state, tau)
                return state, k
            state, _m = smooth(idx, state, tau, nu_coarse)
            return state, jnp.int32(nu_coarse)

        state, _ = smooth(idx, state, tau, nu1)
        d_u, d_v, d_p = defect(level, state, tau)
        d_u = _zero_boundary(d_u)
        d_v = _zero_boundary(d_v)

        Sf = level.inj_full if state_restrict == "inj" else level.res_full
        Si = level.inj_inner if state_restrict == "inj" else level.res_inner
        u_H0 = _mm(_mm(Sf, state.u), Sf.T)
        v_H0 = _mm(_mm(Sf, state.v), Sf.T)
        p_H0 = _mm(_mm(Si, state.p), Si.T)
        u_H0, v_H0 = core.enforce_bc(levels[idx + 1].ops, u_H0, v_H0)
        coarse0 = core.SpectralState(u=u_H0, v=v_H0, p=p_H0)

        rd_u = _zero_boundary(_mm(_mm(level.res_full, d_u), level.res_full.T))
        rd_v = _zero_boundary(_mm(_mm(level.res_full, d_v), level.res_full.T))
        rd_p = _mm(_mm(level.res_inner, d_p), level.res_inner.T)
        R_u0, R_v0, R_p0 = defect(levels[idx + 1], coarse0, None)
        tau_H = (rd_u - R_u0, rd_v - R_v0, rd_p - R_p0)

        coarse, ck = cycle(idx + 1, coarse0, tau_H)

        e_u = damping * _zero_boundary(
            _mm(_mm(level.pro_full, coarse.u - coarse0.u), level.pro_full.T))
        e_v = damping * _zero_boundary(
            _mm(_mm(level.pro_full, coarse.v - coarse0.v), level.pro_full.T))
        if ep0:
            e_p = jnp.zeros_like(state.p)
        else:
            e_p = damping * _mm(_mm(level.pro_inner, coarse.p - coarse0.p),
                                level.pro_inner.T)

        def apply(scale):
            u, v = core.enforce_bc(level.ops, state.u + scale * e_u,
                                   state.v + scale * e_v)
            return core.SpectralState(u=u, v=v, p=state.p + scale * e_p)

        if line_search:
            # accept the largest scale in {1, 1/2, 1/4, 0} that does not
            # increase the (interior, tau-forced) fine defect norm
            def dnorm(s):
                R_u, R_v, R_p = defect(level, s, tau)
                return jnp.sqrt(jnp.sum(_zero_boundary(R_u) ** 2)
                                + jnp.sum(_zero_boundary(R_v) ** 2)
                                + jnp.sum(R_p ** 2))

            d0 = dnorm(state)
            cands = [apply(s) for s in (1.0, 0.5, 0.25)]
            ds = [dnorm(s) for s in cands]
            # first (largest) scale whose defect does not grow; else skip
            pick = jnp.int32(3)
            for i in (2, 1, 0):
                pick = jnp.where(ds[i] <= d0 * 1.0001, jnp.int32(i), pick)
            stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs), *(cands + [state]))
            state = jax.tree.map(lambda x: x[pick], stacked)
        else:
            state = apply(1.0)
        state, _m = smooth(idx, state, tau, nu2)
        return state, ck

    @jax.jit
    def step(state):
        return cycle(0, state, None)

    return step


def diag_tau(levels, state, tau=None, idx=0):
    """Eager tau-magnitude diagnostics down the hierarchy."""
    level = levels[idx]
    if idx == len(levels) - 1:
        return
    R_u, R_v, R_p = core.residuals(level.ops, state.u, state.v, state.p)
    if tau is not None:
        R_u, R_v, R_p = R_u + tau[0], R_v + tau[1], R_p + tau[2]
    d_u = _zero_boundary(R_u)
    d_v = _zero_boundary(R_v)
    u_H0 = _mm(_mm(level.inj_full, state.u), level.inj_full.T)
    v_H0 = _mm(_mm(level.inj_full, state.v), level.inj_full.T)
    p_H0 = _mm(_mm(level.inj_inner, state.p), level.inj_inner.T)
    u_H0, v_H0 = core.enforce_bc(levels[idx + 1].ops, u_H0, v_H0)
    coarse0 = core.SpectralState(u=u_H0, v=v_H0, p=p_H0)
    rd_u = _zero_boundary(_mm(_mm(level.res_full, d_u), level.res_full.T))
    rd_v = _zero_boundary(_mm(_mm(level.res_full, d_v), level.res_full.T))
    rd_p = _mm(_mm(level.res_inner, R_p), level.res_inner.T)
    R_u0, R_v0, R_p0 = core.residuals(levels[idx + 1].ops, u_H0, v_H0, p_H0)
    tau_H = (rd_u - R_u0, rd_v - R_v0, rd_p - R_p0)
    nrm = lambda a: float(jnp.linalg.norm(a))
    print(f"# diag L{idx}(n={level.n}->n={levels[idx+1].n}): "
          f"|d_u|={nrm(d_u):.3e} |rd_u|={nrm(rd_u):.3e} "
          f"|Ru0_int|={nrm(_zero_boundary(R_u0)):.3e} "
          f"|tau_u_int|={nrm(_zero_boundary(tau_H[0])):.3e} "
          f"|d_p|={nrm(R_p):.3e} |rd_p|={nrm(rd_p):.3e} "
          f"|Rp0|={nrm(R_p0):.3e} |tau_p|={nrm(tau_H[2]):.3e}", flush=True)
    diag_tau(levels, coarse0, tau_H, idx + 1)


def fine_metrics(ops, state):
    R_u, R_v, R_p = core.residuals(ops, state.u, state.v, state.p)
    energy = 0.5 * jnp.sum(ops.W2d * (state.u**2 + state.v**2))
    return (float(jnp.linalg.norm(R_p)), float(energy),
            float(jnp.max(jnp.abs(state.u))))


def run_variant(name, levels, params, n_cycles, check_every=50,
                warm_steps=0, **kw):
    step = make_cycle(levels, **kw)
    ops = levels[0].ops

    @jax.jit
    def step_block(state, n=check_every):
        def body(carry, _):
            s, work = carry
            s2, ck = step(s)
            return (s2, work + ck), ()
        (s, work), _ = jax.lax.scan(body, (state, jnp.int32(0)), None,
                                    length=n)
        return s, work

    state = core.initial_state(ops)
    if warm_steps:
        @jax.jit
        def warm(s):
            def body(ss, _):
                ss2, _m = core.sg_step(ops, ss)
                return ss2, ()
            return jax.lax.scan(body, s, None, length=warm_steps)[0]
        state = warm(state)
        cont, energy, _ = fine_metrics(ops, state)
        print(f"# {name}: after {warm_steps} warm SG steps: "
              f"cont={cont:.4e} energy={energy:.6f}", flush=True)
    t0 = time.time()
    hist = []
    coarse_work = 0
    prev_u = state.u
    for c in range(0, n_cycles, check_every):
        state, work = step_block(state)
        coarse_work += int(work)
        cont, energy, umax = fine_metrics(ops, state)
        rel = float(jnp.linalg.norm(state.u - prev_u)
                    / jnp.maximum(jnp.linalg.norm(state.u), 1e-30))
        prev_u = state.u
        hist.append((c + check_every, cont, energy, rel))
        if not np.isfinite(cont):
            break
        if rel < 1e-7 and c > 2 * check_every:
            break
    wall = time.time() - t0
    last = hist[-1]
    ghia = {}
    if np.isfinite(last[1]):
        try:
            import pandas as pd
            from anap3_tpu.ops import basis as B
            N = levels[0].n
            bx = B.make_basis(params.basis_type, (0.0, params.Lx))
            xn = bx.nodes(N + 1)
            xc = int(np.argmin(np.abs(xn - 0.5)))
            u = np.asarray(state.u, float)
            v = np.asarray(state.v, float)
            for comp, fld in (("u", u[xc, :]), ("v", v[:, xc])):
                csv = (f"/root/repo/data/validation/ghia/"
                       f"ghia_Re{int(params.Re)}_{comp}_centerline.csv")
                tab = pd.read_csv(csv)
                coord = "y" if comp == "u" else "x"
                pts = tab[coord].to_numpy()
                itr = (pts > 1e-6) & (pts < 1 - 1e-6)
                vals = B.spectral_interpolate(xn, fld, pts)
                ghia[f"ghia_{comp}_err"] = round(float(np.max(
                    np.abs(vals - tab[comp].to_numpy())[itr])), 4)
        except Exception as exc:
            ghia["ghia_error"] = repr(exc)[:80]
    print(json.dumps({
        "variant": name, "cycles": last[0], "continuity": last[1],
        "energy": last[2], "rel_per_%d_cycles" % check_every: last[3],
        "coarse_steps_total": coarse_work, "wall_s": round(wall, 1), **ghia,
        "trace": [(h[0], round(h[1], 6), round(h[2], 6)) for h in hist[::4]],
    }))
    return last


def sg_truth(params, max_steps=400000):
    ops, _ = core.build_spectral_ops(params)
    state = core.initial_state(ops)

    @jax.jit
    def chunk(s):
        def body(ss, _):
            ss2, m = core.sg_step(ops, ss)
            return ss2, m["continuity"]
        return jax.lax.scan(body, s, None, length=2000)

    c0 = None
    for k in range(max_steps // 2000):
        state, cont = chunk(state)
        c = float(cont[-1])
        if c0 is None:
            c0 = max(c, 1e-30)
        if c / c0 < 1e-6:
            break
    _, energy, _ = fine_metrics(ops, state)
    print(json.dumps({"variant": "SG_truth", "steps": (k + 1) * 2000,
                      "continuity": c, "energy": energy}))
    return energy


if __name__ == "__main__":
    N, Re = int(sys.argv[1]) if len(sys.argv) > 1 else 48, \
        float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    variants = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "truth", "base", "ep0", "cvg", "cvg_ep0"]
    params = SpectralParameters(
        name="spectral", Re=Re, nx=N, ny=N, basis_type="chebyshev",
        CFL=1.5, beta_squared=5.0, corner_treatment="smoothing",
        corner_smoothing=0.15, dtype="float32", n_levels=10)
    levels = build_vmg_levels(params)
    print("hierarchy:", [lv.n for lv in levels], flush=True)

    if "truth" in variants:
        sg_truth(params)
    kw = dict(nu1=2, nu2=2)
    n_cycles = int(sys.argv[4]) if len(sys.argv) > 4 else 4000
    if "base" in variants:
        run_variant("base", levels, params, n_cycles, nu_coarse=30,
                    damping=1.0, **kw)
    if "ep0" in variants:
        run_variant("ep0", levels, params, n_cycles, nu_coarse=30,
                    damping=1.0, ep0=True, **kw)
    if "cvg" in variants:
        run_variant("cvg", levels, params, n_cycles, coarse_converge=True,
                    damping=1.0, **kw)
    if "cvg_ep0" in variants:
        run_variant("cvg_ep0", levels, params, n_cycles, coarse_converge=True,
                    damping=1.0, ep0=True, **kw)
    if "diag1" in variants:
        # tau magnitudes down the hierarchy, cold start and after warm SG
        ops0 = levels[0].ops
        st = core.initial_state(ops0)
        print("# cold start:")
        diag_tau(levels, st)
        @jax.jit
        def _warm(s):
            def body(ss, _):
                ss2, _m = core.sg_step(ops0, ss)
                return ss2, ()
            return jax.lax.scan(body, s, None, length=20000)[0]
        st = _warm(st)
        print("# after 20000 SG steps:")
        diag_tau(levels, st)
    if "warm" in variants:
        run_variant("warm", levels, params, n_cycles, warm_steps=20000,
                    nu_coarse=30, damping=1.0, **kw)
    if "warm_cvg" in variants:
        run_variant("warm_cvg", levels, params, n_cycles, warm_steps=20000,
                    coarse_converge=True, damping=1.0, diag=False, **kw)
    if "proj" in variants:
        run_variant("proj", levels, params, n_cycles, nu_coarse=30,
                    damping=1.0, state_restrict="res", **kw)
    if "lvl2" in variants:
        run_variant("lvl2", levels[:2], params, n_cycles, nu_coarse=30,
                    damping=1.0, **kw)
    if "lvl2_cvg" in variants:
        run_variant("lvl2_cvg", levels[:2], params, n_cycles,
                    coarse_converge=True, damping=1.0, **kw)
    if "ls" in variants:
        run_variant("ls", levels, params, n_cycles, nu_coarse=30,
                    damping=1.0, line_search=True, **kw)
    if "ls2" in variants:
        run_variant("ls2", levels[:2], params, n_cycles, nu_coarse=30,
                    damping=1.0, line_search=True, **kw)
    if "proj2" in variants:
        run_variant("proj2", levels[:2], params, n_cycles, nu_coarse=30,
                    damping=1.0, state_restrict="res", **kw)
