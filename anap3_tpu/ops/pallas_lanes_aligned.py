"""Lane-batched bordered-core kernel: B sweep lanes of the ALIGNED tier.

Round 3 measured the production batched-sweep path (ops/pallas_lanes.py,
built on the padded TILED engine) at 59k aggregate lane-steps/s at
N=128 B=8 — ~3x SLOWER than running the same lanes serially through the
bordered-core aligned kernel (182k). The padding tax the aligned kernel
removes for B=1 (every dot at N=128 pays 12 MXU passes for ~2 of useful
work) was still being paid per lane. This module lane-batches the aligned
decomposition itself (ops/pallas_aligned.py):

- lane states ride ROW-STACKED ``(B*N, N)`` CORE arrays (no +1 padding:
  borders are per-run constants per lane, exactly as in the B=1 aligned
  kernel — lane b owns rows ``[b*N, (b+1)*N)``; N % 8 == 0 keeps every
  per-lane row slice sublane-aligned);
- RIGHT-side products contract over columns, so ONE MXU dot serves the
  whole batch (``(B*N, N) @ (N, 2N)``); the per-lane rank-1 lid
  completions (CU2) are stacked and added in one VPU op;
- LEFT-side products stay per-lane with the same dot shapes as the B=1
  aligned kernel — per-lane arithmetic is BIT-IDENTICAL to
  ops/pallas_aligned.make_aligned_chunk_runner at the same
  ``metrics_every`` (matmul row-blocks are independent, so the batched
  right dots produce bit-identical per-lane rows);
- the per-lane convergence state machine (rel-iter criterion, warmup
  gate, NaN freeze) matches the B=1 kernel per lane: a converged or
  diverged lane freezes without disturbing its neighbours;
- conserved quantities AND residual-norm border strips run on the
  ``metrics_every`` cadence (held per-lane carries in between) — the
  rel_iter/energy criteria the sweep path uses never read them per step.

Reference semantics: per-lane solver is src/solvers/spectral/sg.py
(residuals :278-346, CFL dt :387-408, RK4 :410-449); lane isolation is the
reference's divergence handling (multigrid/fsg.py:1184-1190). Scope:
shared operator matrices across lanes and a uniform corner mode —
regularized lanes need the cavity BC structure (bc_v == 0, bc_u nonzero
only on the lid column); singular lanes (round 5) carry the per-lane
sampled corner-flow constants and generalized CU2/CV2/CLU/CLV border
completions exactly as the B=1 aligned kernel does, with convection,
quadratures and CFL wave speeds on the TOTAL velocity. Mixed-mode or
non-cavity sweeps fall back to the tiled lane kernel / vmapped path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.spectral_sg import SpectralOps, SpectralState
from .pallas_tiled import _DotEngine, _RK4_ALPHAS, N_COLS
from .pallas_aligned import (
    _prep_aligned, _corner_dot, aligned_supported,
    _NU, _BETA, _CFL, _LID, _IDX, _IDY, _DYT_BB, _DYYT_BB, _UBORD_SQ,
    _E_BORD, _CONV_BB, _LAPU_BB, _LAPV_BB, _OM_BB, _WBB, _DX_BB,
    _VBORD_SQ, _CONVV_BB, _N_SCAL,
    _C_UCOL, _C_CONVU, _C_DUDXX, _C_WCOL, _C_DXCB, _C_IYTCB, _C_GYTCB,
    _C_DYTCB, _C_CONVV, _C_DVDX, _C_DVDXX, _C_VCOL, _C_SW, _C_SDWX,
    _C_SDWY,
    _R_DYTBC, _R_LAPU, _R_WROW, _R_LAPV, _R_OM, _R_SW, _R_SDWX, _R_SDWY,
)

__all__ = ["make_aligned_lane_runner", "aligned_lanes_supported",
           "suggest_aligned_lane_count"]

# Per-lane VMEM units (one unit = nc * roundup(nc, 128) * 4 bytes — the
# LANE-PADDED core footprint: Mosaic stores the last axis in 128-wide
# tiles, so at N=96 every (96, 96) value occupies a (96, 128) tile).
# MEASURED, not modeled: N=96 B=64 x3 compiles to 138.55 MB total
# (XLA:TPU "Ran out of memory in memory space vmem", v5e 128 MB physical)
# = 2.17 MB/lane = 44 padded units/lane — the stage SSA temporaries
# (bf16 hi/lo splits, per-lane left products in flight, RU/RV values)
# dominate the 8 nameable arrays. 48 units keeps ~10% headroom.
_UNITS_PER_LANE = 48.0
# Budget below the v5e's 128 MB physical VMEM to leave room for the
# shared operator matrices, the stacked CU2/CCOL/CROW constants, and the
# compiler stack. N=96 B=32 measured working (~69 MB of lane state).
_VMEM_BUDGET_BYTES = 80 * 2**20
# Singular lanes add 14 stacked (nc, nc)-unit constant fields per lane
# (SU/SV/SDUDX/SDVDX/SDUDY/SW/SDWX/SDWY/BCU/BCV + the split CLU/CLV
# rank-1 completions) plus the doubled-width CV2 (2 units) — 16 extra
# padded units on top of the measured 48.
_UNITS_PER_LANE_SINGULAR = _UNITS_PER_LANE + 16.0


def suggest_aligned_lane_count(n: int, requested: int,
                               singular: bool = False) -> int:
    """Largest B <= requested whose working set fits the VMEM budget."""
    unit = n * (((n + 127) // 128) * 128) * 4
    per_lane = _UNITS_PER_LANE_SINGULAR if singular else _UNITS_PER_LANE
    fit = max(1, int(_VMEM_BUDGET_BYTES / (per_lane * unit)))
    return max(1, min(int(requested), fit))


def aligned_lanes_supported(ops_list) -> bool:
    """True when the aligned lane kernel covers this batch: supported
    core size, shared operators, uniform mode (all-regularized with the
    cavity BC structure, or all-singular)."""
    n = int(np.asarray(ops_list[0].bc_u).shape[0]) - 1
    singular = ops_list[0].sing_u is not None
    if not aligned_supported(n, singular=singular):
        return False
    try:
        _validate_aligned_lanes(ops_list)
    except ValueError:
        return False
    return suggest_aligned_lane_count(
        n, len(ops_list), singular=singular) >= len(ops_list)


def _validate_aligned_lanes(ops_list) -> None:
    """Lanes must share every operator matrix (same N/basis/domain) and a
    uniform corner mode; only scalars, the lid profile, and (in singular
    mode) the per-lane sampled corner-flow constants may vary.

    Regularized lanes additionally need the cavity BC structure (bc_v == 0,
    bc_u nonzero only on the lid column); singular lanes carry arbitrary
    constant borders through the generalized CU2/CV2/CLU/CLV completions
    (the wall-total cancellation is asserted inside _prep_aligned)."""
    o0 = ops_list[0]
    singular = o0.sing_u is not None
    for k, o in enumerate(ops_list[1:], 1):
        for name in ("Dx", "DyT", "Dxx", "DyyT", "Ix", "IyT", "Gx", "GyT",
                     "interior", "W2d"):
            if not np.array_equal(np.asarray(getattr(o0, name)),
                                  np.asarray(getattr(o, name))):
                raise ValueError(
                    f"lane {k} operator {name!r} differs from lane 0: "
                    "lane-batched kernels need shared operators")
    for k, o in enumerate(ops_list):
        if (o.sing_u is not None) != singular:
            raise ValueError(
                "aligned lane kernel needs a uniform corner mode across "
                f"lanes (lane {k} differs from lane 0)")
        if not singular:
            bc_u = np.asarray(o.bc_u)
            if np.any(np.asarray(o.bc_v)) or np.any(bc_u[:, :-1]):
                raise ValueError(
                    "aligned lane kernel assumes the cavity BC structure "
                    "(bc_v == 0, bc_u nonzero only on the lid column)")


def make_aligned_lane_runner(ops_list, chunk: int, tolerance: float,
                             warmup: int, interpret: bool = False,
                             algorithm: str = "x3", metrics_every: int = 1):
    """Build the fused B-lane aligned chunk function.

    Returns ``chunk_fn(states, start_iter) -> (states, done, conv_iter,
    ever_conv, rows)`` with batched ``states`` (leading axis B), per-lane
    ``done/conv_iter/ever_conv`` of shape (B,), and ``rows`` of shape
    (chunk, B, N_COLS) in runner.METRIC_KEYS order — the same contract as
    ops/pallas_lanes.make_lane_chunk_runner.
    """
    B = len(ops_list)
    if B < 1:
        raise ValueError("need at least one lane")
    _validate_aligned_lanes(ops_list)
    if algorithm not in ("x1", "x3", "x6"):
        raise ValueError(f"unknown matmul algorithm {algorithm!r}")
    metrics_every = max(1, int(metrics_every))
    chunk = int(chunk)
    f32 = jnp.float32

    # host prep per lane via the B=1 aligned prep (all f64 host math);
    # shared operator matrices come from lane 0, per-lane constants stack
    sing = ops_list[0].sing_u is not None
    preps = [_prep_aligned(o, algorithm) for o in ops_list]
    mats0, _, nf, ni, nc = preps[0]
    # shared operator matrices + masks (validated identical across lanes);
    # CU2/CCOL/CROW and the singular constant fields are per-lane and stack
    _PER_LANE = ("CU2", "CCOL", "CROW", "CV2", "CLU", "CLV", "BCU", "BCV",
                 "SU", "SV", "SDUDX", "SDVDX", "SW", "SDWX", "SDWY")
    mats = {k: v for k, v in mats0.items() if k not in _PER_LANE}
    CU2 = jnp.concatenate([p[0]["CU2"] for p in preps], axis=0)  # (B*nc,2nc)
    CCOL = jnp.concatenate([p[0]["CCOL"] for p in preps], axis=0)
    CROW = jnp.concatenate([p[0]["CROW"] for p in preps], axis=0)  # (8B,nc)
    scal = jnp.concatenate([p[1] for p in preps], axis=0)  # (B, _N_SCAL)
    # stacked singular constants (all (B*nc, *) f32): the rank-1 border
    # completions CV2/CLU/CLV (CLU/CLV split into their Dx / Dxx halves to
    # match the split per-lane left buffers DU/LXU/DV/LXV), the stage BC
    # cores, and the sampled corner-flow fields. SDUDY is precomputed via
    # the curl identity s_dudy = s_dvdx - s_w (same f32 subtract the B=1
    # kernel performs in-stage — bit-identical values).
    _SING_STACK = ("CV2", "CLU_D", "CLU_XX", "CLV_D", "CLV_XX", "BCU",
                   "BCV", "SU", "SV", "SDUDX", "SDVDX", "SDUDY", "SW",
                   "SDWX", "SDWY")
    if sing:
        def stk(name):
            return jnp.concatenate([p[0][name] for p in preps], axis=0)

        sing_stk = {
            "CV2": stk("CV2"),
            "CLU_D": jnp.concatenate(
                [p[0]["CLU"][0:nc] for p in preps], axis=0),
            "CLU_XX": jnp.concatenate(
                [p[0]["CLU"][nc:2 * nc] for p in preps], axis=0),
            "CLV_D": jnp.concatenate(
                [p[0]["CLV"][0:nc] for p in preps], axis=0),
            "CLV_XX": jnp.concatenate(
                [p[0]["CLV"][nc:2 * nc] for p in preps], axis=0),
            "BCU": stk("BCU"), "BCV": stk("BCV"),
            "SU": stk("SU"), "SV": stk("SV"),
            "SDUDX": stk("SDUDX"), "SDVDX": stk("SDVDX"),
            "SDUDY": stk("SDVDX") - stk("SW"),
            "SW": stk("SW"), "SDWX": stk("SDWX"), "SDWY": stk("SDWY"),
        }
        sing_list = [sing_stk[k] for k in _SING_STACK]
    else:
        sing_list = []
    n_sing = len(sing_list)
    mat_names = list(mats)
    n_mats = len(mat_names)
    BN = B * nc
    # COLUMN-PACKED left products (round 5, VERDICT r4 #2): when nc is not
    # a 128-lane multiple, the per-lane left dots each pay the
    # ceil(nc/128) output-width padding (at nc=96 only 0.75 of every MXU
    # pass is useful) — column-stacking GROUPS of lane cores into wider
    # left dots lands the output width on exact 128-multiples. Column
    # blocks of a matmul are computed independently with identical
    # summation order, so per-lane outputs stay BIT-IDENTICAL; the cost is
    # a VMEM relayout of u/v/p per stage (concatenate along lanes) plus a
    # second hi/lo split of the packed operands. The k-axis (contraction)
    # padding remains — it is the per-lane state row count and no output
    # packing can change it. Group size is the SMALLEST lane count whose
    # packed width is an exact 128-multiple (4 at nc=96): packing all B
    # lanes into one dot is the same math but was measured to explode
    # Mosaic compile time (N=96 B=32 single-concat: >560 s vs 19 s at
    # B=8), while fixed-width groups keep compile linear in B and erase
    # the same padding. Lanes past the last full group run per-lane.
    gsz = (128 // math.gcd(nc, 128)) if nc % 128 else 1
    packed = 1 < gsz <= B

    # Batched-elementwise constants (round-4 issue-count optimization: ONE
    # VPU op per expression updates every lane): the interior mask tiled
    # per lane, and per-lane nu/beta broadcast columns. Per-element math is
    # identical to the per-lane form, so per-lane bit-exactness with the
    # B=1 aligned kernel is preserved.
    INTR = jnp.asarray(
        np.tile(np.asarray(mats["interior"], np.float32), (B, 1)))
    NU_COL = jnp.asarray(np.repeat(
        [float(o.nu) for o in ops_list], nc).reshape(BN, 1), f32)
    BETA_COL = jnp.asarray(np.repeat(
        [float(o.beta_sq) for o in ops_list], nc).reshape(BN, 1), f32)

    # one row of per-lane metric octets, padded to the 128-lane tile
    RW = max(128, -(-8 * B // 128) * 128)

    def kernel(*args):
        refs = dict(zip(mat_names, args[:n_mats]))
        srefs = dict(zip(_SING_STACK, args[n_mats:n_mats + n_sing]))
        (cu2_ref, ccol_ref, crow_ref, intr_t_ref, nu_col_ref, beta_col_ref,
         u_in, v_in, p_in, scal_ref, iscal_ref,
         u_out, v_out, p_out, rows_out, state_out,
         su, sv, sp, DU, DV, LXU, LXV, A5, A6) = args[n_mats + n_sing:]

        eng = _DotEngine(algorithm, refs)
        start_iter = iscal_ref[0, 0]
        w2d = refs["W2d"][:]
        cu2 = cu2_ref[:]
        intr_t = intr_t_ref[:]       # (BN, nc) tiled interior mask
        nu_t = nu_col_ref[:]         # (BN, 1) per-lane nu broadcast
        beta_t = beta_col_ref[:]

        def lane(b):
            return slice(b * nc, (b + 1) * nc)

        def col(b, i):
            return ccol_ref[b * nc:(b + 1) * nc, i:i + 1]

        def row(b, i):
            return crow_ref[8 * b + i:8 * b + i + 1, :]

        def s(b, i):
            return scal_ref[b, i]

        def eng_lrow_dx():
            """Dx's border row as an f32 (1, nc) value for corner dots."""
            if eng.hl:
                return (refs["LROWS_hi"][0:1, :].astype(f32)
                        + refs["LROWS_lo"][0:1, :].astype(f32))
            return refs["LROWS"][0:1, :]

        def run_stage(adts, accumulate: bool):
            """One RK stage on every lane core. ``adts`` is the per-lane
            alpha*dt list. Returns the last stage's batched residuals and
            cached operands for the (decimated) residual-norm pass.

            The only per-lane work is the three left dots (they contract
            over rows, which lanes share); everything else — right dots,
            pressure gradients, and the whole elementwise residual/update
            path — runs batched over the stacked (BN, nc) layout."""
            u_c = eng.cache(su[:])
            v_c = eng.cache(sv[:])
            p_c = eng.cache(sp[:])
            # batched rights: one MXU dot covers every lane; the per-lane
            # rank-1 lid completions ride the stacked CU2 in one VPU add
            RU = eng.right(u_c, "DY2") + cu2
            RV = eng.right(v_c, "DY2")
            if sing:
                RV = RV + srefs["CV2"][:]
            n_packed = (B // gsz) * gsz if packed else 0
            for g0 in range(0, n_packed, gsz):
                # column-packed group dot: gsz lanes stack along output
                # columns onto exact 128-multiples (u|v merged as in
                # left2 — column order is [u lanes..., v lanes...])
                grp = range(g0, g0 + gsz)
                uv_cols = jnp.concatenate(
                    [su[lane(b), :] for b in grp]
                    + [sv[lane(b), :] for b in grp], axis=1)
                p_cols = jnp.concatenate(
                    [sp[lane(b), :] for b in grp], axis=1)
                LUV = eng.left("DX2", eng.cache(uv_cols))  # (2nc, 2g*nc)
                LPP = eng.left_hl("PX2", eng.cache(p_cols))  # (2nc, g*nc)
                gw = gsz * nc
                for j, b in enumerate(grp):
                    r = lane(b)
                    cu = slice(j * nc, (j + 1) * nc)
                    cv = slice(gw + j * nc, gw + (j + 1) * nc)
                    DU[r, :] = LUV[0:nc, cu]
                    LXU[r, :] = LUV[nc:2 * nc, cu]
                    DV[r, :] = LUV[0:nc, cv]
                    LXV[r, :] = LUV[nc:2 * nc, cv]
                    A5[r, :] = LPP[0:nc, cu]
                    A6[r, :] = LPP[nc:2 * nc, cu]
            for b in range(n_packed, B):
                r = lane(b)
                LU, LV = eng.left2("DX2", u_c, v_c, rows=r)  # merged u|v
                LP = eng.left_hl("PX2", p_c, rows=r)   # [a5 ; a6]
                DU[r, :] = LU[0:nc, :]
                LXU[r, :] = LU[nc:2 * nc, :]
                DV[r, :] = LV[0:nc, :]
                LXV[r, :] = LV[nc:2 * nc, :]
                A5[r, :] = LP[0:nc, :]
                A6[r, :] = LP[nc:2 * nc, :]
            if sing:
                # border-row rank-1 completions, batched over the stacked
                # split halves (B=1 adds the unsplit CLU/CLV in one op —
                # same summands, same per-element order)
                DU[:] = DU[:] + srefs["CLU_D"][:]
                LXU[:] = LXU[:] + srefs["CLU_XX"][:]
                DV[:] = DV[:] + srefs["CLV_D"][:]
                LXV[:] = LXV[:] + srefs["CLV_XX"][:]
            a5_c = eng.cache(A5[:])
            a6_c = eng.cache(A6[:])
            DPX = eng.right_hl(a5_c, "IyT")            # batched
            DPY = eng.right_hl(a6_c, "GyT")
            adt_col = jnp.concatenate(
                [jnp.full((nc, 1), adts[b], f32) for b in range(B)])
            u_b = su[:]
            v_b = sv[:]
            du_dx = DU[:]
            dv_dx = DV[:]
            du_dy = RU[:, 0:nc]
            dv_dy = RV[:, 0:nc]
            lap_u = LXU[:] + RU[:, nc:2 * nc]
            lap_v = LXV[:] + RV[:, nc:2 * nc]
            if sing:
                # convection rides the TOTAL velocity; sampled singular
                # derivatives are stacked constants (s_dvdy = -s_dudx)
                U = u_b + srefs["SU"][:]
                V = v_b + srefs["SV"][:]
                R_u = -(U * (du_dx + srefs["SDUDX"][:])
                        + V * (du_dy + srefs["SDUDY"][:])) \
                    - DPX + nu_t * lap_u
                R_v = -(U * (dv_dx + srefs["SDVDX"][:])
                        + V * (dv_dy - srefs["SDUDX"][:])) \
                    - DPY + nu_t * lap_v
            else:
                R_u = -(u_b * du_dx + v_b * du_dy) - DPX + nu_t * lap_u
                R_v = -(u_b * dv_dx + v_b * dv_dy) - DPY + nu_t * lap_v
            R_p = -beta_t * (du_dx + dv_dy) * intr_t
            if sing:
                su[:] = jnp.where(intr_t > 0.5, u_out[:] + adt_col * R_u,
                                  srefs["BCU"][:])
                sv[:] = jnp.where(intr_t > 0.5, v_out[:] + adt_col * R_v,
                                  srefs["BCV"][:])
            else:
                su[:] = jnp.where(intr_t > 0.5, u_out[:] + adt_col * R_u,
                                  0.0)
                sv[:] = jnp.where(intr_t > 0.5, v_out[:] + adt_col * R_v,
                                  0.0)
            sp[:] = p_out[:] + adt_col * R_p
            if not accumulate:
                return None
            return (R_u, R_v, R_p), u_c, v_c, p_c, a5_c, a6_c

        def res_pass(stage_out):
            """Per-lane full-grid residual norms: core + exact border
            strips — the B=1 aligned res_pass applied lane by lane (the
            thin right dots batch across lanes)."""
            (R_U, R_V, R_P), u_c, v_c, p_c, a5_c, a6_c = stage_out
            TU_all = eng.right(u_c, "RCOLS")
            TV_all = eng.right(v_c, "RCOLS")
            T5_all = eng.right(a5_c, "RCOLS")
            T6_all = eng.right(a6_c, "RCOLS")
            out = []
            for b in range(B):
                r = lane(b)
                R_u, R_v, R_p = R_U[r, :], R_V[r, :], R_P[r, :]
                acc_u = jnp.sum(R_u * R_u)
                acc_v = jnp.sum(R_v * R_v)
                acc_p = jnp.sum(R_p * R_p)  # interior-masked
                nu_b = s(b, _NU)
                TU = TU_all[r, :]
                TV = TV_all[r, :]
                T5 = T5_all[r, :]
                T6 = T6_all[r, :]
                Lu8, Lv8 = eng.left2("LROWS", u_c, v_c, rows=r)
                Lp8 = eng.left("LROWS", p_c, rows=r)
                # column strip (j = N)
                du_dyy_cb = TU[:, 1:2] + col(b, _C_UCOL) * s(b, _DYYT_BB)
                R_u_cb = (-col(b, _C_CONVU) - T5[:, 2:3]
                          + nu_b * (col(b, _C_DUDXX) + du_dyy_cb))
                dv_dyy_cb = TV[:, 1:2] + col(b, _C_VCOL) * s(b, _DYYT_BB)
                R_v_cb = (-col(b, _C_CONVV) - T6[:, 3:4]
                          + nu_b * (col(b, _C_DVDXX) + dv_dyy_cb))
                # row strip (i = N)
                a5_bc = Lp8[2:3, :]
                a6_bc = Lp8[3:4, :]
                dpx_bc = eng.right(eng.cache(a5_bc), "IyT")
                dpy_bc = eng.right(eng.cache(a6_bc), "GyT")
                R_u_bc = -dpx_bc + nu_b * (Lu8[1:2, :] + row(b, _R_LAPU))
                R_v_bc = -dpy_bc + nu_b * (Lv8[1:2, :] + row(b, _R_LAPV))
                # corner (N, N)
                dpx_bb = _corner_dot(a5_bc, col(b, _C_IYTCB))
                dpy_bb = _corner_dot(a6_bc, col(b, _C_GYTCB))
                R_u_bb = -s(b, _CONV_BB) - dpx_bb + nu_b * s(b, _LAPU_BB)
                R_v_bb = -s(b, _CONVV_BB) - dpy_bb + nu_b * s(b, _LAPV_BB)
                acc_u = (acc_u + jnp.sum(R_u_cb * R_u_cb)
                         + jnp.sum(R_u_bc * R_u_bc) + R_u_bb * R_u_bb)
                acc_v = (acc_v + jnp.sum(R_v_cb * R_v_cb)
                         + jnp.sum(R_v_bc * R_v_bc) + R_v_bb * R_v_bb)
                out.append((jnp.sqrt(acc_u), jnp.sqrt(acc_v),
                            jnp.sqrt(acc_p)))
            return (tuple(o[0] for o in out), tuple(o[1] for o in out),
                    tuple(o[2] for o in out))

        def metrics_pass():
            """Per-lane conserved quantities: core quadratures + exact
            border strips — the B=1 aligned metrics_pass, with the right
            dots batched across lanes."""
            u_c = eng.cache(su[:])
            v_c = eng.cache(sv[:])
            DUY = eng.right(u_c, "DyT")     # batched
            RCU = eng.right(u_c, "RCOLS")   # batched (om column strips)
            OM = jnp.concatenate(
                [eng.left("Dx", v_c, rows=lane(b))
                 - (DUY[lane(b), :] + cu2[lane(b), 0:nc])
                 for b in range(B)], axis=0)
            if sing:
                OM = OM + srefs["CLV_D"][:]
            om_c = eng.cache(OM)
            DWY = eng.right(om_c, "DyT")    # batched
            RCW = eng.right(om_c, "RCOLS")  # batched (dwy column strips)
            es, zs, ps = [], [], []
            for b in range(B):
                r = lane(b)
                om = OM[r, :]
                om_cb = col(b, _C_DVDX) - (RCU[r, 0:1]
                                           + col(b, _C_UCOL) * s(b, _DYT_BB))
                om_bc = eng.left("LROWS", v_c, rows=r)[0:1, :] + row(b, _R_OM)
                om_bb = s(b, _OM_BB)
                if sing:
                    # quadratures run over TOTALS (smooth + sampled)
                    u_b = su[r, :] + srefs["SU"][r, :]
                    v_b = sv[r, :] + srefs["SV"][r, :]
                    om_t = om + srefs["SW"][r, :]
                    om_cb_t = om_cb + col(b, _C_SW)
                    om_bc_t = om_bc + row(b, _R_SW)
                else:
                    u_b = su[r, :]
                    v_b = sv[r, :]
                    om_t, om_cb_t, om_bc_t = om, om_cb, om_bc
                energy = 0.5 * jnp.sum(w2d * (u_b * u_b + v_b * v_b)) \
                    + s(b, _E_BORD)
                enstrophy = 0.5 * (
                    jnp.sum(w2d * om_t * om_t)
                    + jnp.sum(col(b, _C_WCOL) * om_cb_t * om_cb_t)
                    + jnp.sum(row(b, _R_WROW) * om_bc_t * om_bc_t)
                    + s(b, _WBB) * om_bb * om_bb)
                dwx = eng.left("Dx", om_c, rows=r) + col(b, _C_DXCB) * om_bc
                dwy = DWY[r, :] + om_cb * row(b, _R_DYTBC)
                if sing:
                    dwx = dwx + srefs["SDWX"][r, :]
                    dwy = dwy + srefs["SDWY"][r, :]
                pal = jnp.sum(w2d * (dwx * dwx + dwy * dwy))
                omcb_c = eng.cache(om_cb)
                ombc_c = eng.cache(om_bc)
                dwx_cb = eng.left("Dx", omcb_c) + col(b, _C_DXCB) * om_bb \
                    + col(b, _C_SDWX)
                dwy_cb = RCW[r, 0:1] + om_cb * s(b, _DYT_BB) \
                    + col(b, _C_SDWY)
                dwx_bc = eng.left("LROWS", om_c, rows=r)[0:1, :] \
                    + s(b, _DX_BB) * om_bc + row(b, _R_SDWX)
                dwy_bc = eng.right(ombc_c, "DyT") + om_bb * row(b, _R_DYTBC) \
                    + row(b, _R_SDWY)
                dwx_bb = _corner_dot(eng_lrow_dx(), om_cb) \
                    + s(b, _DX_BB) * om_bb
                dwy_bb = _corner_dot(om_bc, col(b, _C_DYTCB)) \
                    + om_bb * s(b, _DYT_BB)
                pal = pal + jnp.sum(col(b, _C_WCOL) * (dwx_cb * dwx_cb
                                                       + dwy_cb * dwy_cb)) \
                    + jnp.sum(row(b, _R_WROW) * (dwx_bc * dwx_bc
                                                 + dwy_bc * dwy_bc)) \
                    + s(b, _WBB) * (dwx_bb * dwx_bb + dwy_bb * dwy_bb)
                es.append(energy)
                zs.append(enstrophy)
                ps.append(0.5 * pal)
            return tuple(es), tuple(zs), tuple(ps)

        def loop_body(i, carry):
            done_t, conv_t, e_t, z_t, pl_t, ru_t, rv_t, rp_t = carry
            idx = start_iter + i

            su[:] = u_out[:]
            sv[:] = v_out[:]
            sp[:] = p_out[:]

            # per-lane full-grid prev norms (core + constant border mass)
            # and CFL dt — identical math to the B=1 aligned kernel
            prev_u, prev_v, adts = [], [], []
            for b in range(B):
                r = lane(b)
                ub = su[r, :]
                vb = sv[r, :]
                prev_u.append(jnp.sqrt(jnp.sum(ub * ub) + s(b, _UBORD_SQ)))
                prev_v.append(jnp.sqrt(jnp.sum(vb * vb) + s(b, _VBORD_SQ)))
                beta_b = s(b, _BETA)
                # wave speeds belong to the TOTAL velocity (B=1 parity)
                u_eff = ub + srefs["SU"][r, :] if sing else ub
                v_eff = vb + srefs["SV"][r, :] if sing else vb
                u_max = jnp.maximum(jnp.max(jnp.abs(u_eff)), s(b, _LID))
                v_max = jnp.maximum(jnp.max(jnp.abs(v_eff)), 1e-10)
                lam_x = ((u_max + jnp.sqrt(u_max * u_max + beta_b))
                         * s(b, _IDX) + s(b, _NU) * s(b, _IDX) * s(b, _IDX))
                lam_y = ((v_max + jnp.sqrt(v_max * v_max + beta_b))
                         * s(b, _IDY) + s(b, _NU) * s(b, _IDY) * s(b, _IDY))
                adts.append(s(b, _CFL) / (lam_x + lam_y))

            stage_out = None
            for k, alpha in enumerate(_RK4_ALPHAS):
                stage_out = run_stage([a * alpha for a in adts],
                                      accumulate=(k == len(_RK4_ALPHAS) - 1))

            if metrics_every == 1:
                ru_t, rv_t, rp_t = res_pass(stage_out)
                e_t, z_t, pl_t = metrics_pass()
            else:
                # first step of every chunk is always fresh: the held
                # carries init to 0.0 per chunk call, so a chunk length
                # that is not a metrics_every multiple would otherwise
                # record zeros until the global cadence next fires (see
                # ops/pallas_aligned.py loop_body)
                on_cadence = (i == jnp.int32(0)) | (
                    idx % jnp.int32(metrics_every) == 0)
                ru_t, rv_t, rp_t = jax.lax.cond(
                    on_cadence, lambda: res_pass(stage_out),
                    lambda: (ru_t, rv_t, rp_t))
                e_t, z_t, pl_t = jax.lax.cond(
                    on_cadence, metrics_pass, lambda: (e_t, z_t, pl_t))

            nan = jnp.float32(jnp.nan)
            lane_octets = []
            new_done, new_conv = [], []
            for b in range(B):
                r = lane(b)
                done_b = done_t[b] > 0
                du = jnp.sqrt(jnp.sum((su[r, :] - u_out[r, :]) ** 2))
                dv = jnp.sqrt(jnp.sum((sv[r, :] - v_out[r, :]) ** 2))
                rel = jnp.maximum(du / (prev_u[b] + 1e-12),
                                  dv / (prev_v[b] + 1e-12))
                vals = (rel, ru_t[b], rv_t[b], rp_t[b],
                        e_t[b], z_t[b], pl_t[b], jnp.float32(0.0))
                octet = jnp.stack(
                    [jnp.where(done_b, nan, v) for v in vals]).reshape(1, 8)
                lane_octets.append(octet)

                finite = jnp.isfinite(rel)
                newly_conv = (idx >= warmup) & (rel < tolerance) & finite
                newly_div = ~finite & ~done_b
                now_done = done_b | newly_conv | newly_div
                new_conv.append(jnp.where(~done_b & now_done, idx + 1,
                                          conv_t[b]))
                new_done.append(now_done.astype(jnp.int32))

                @pl.when(jnp.logical_not(done_b))
                def _commit(r=r):
                    u_out[r, :] = su[r, :]
                    v_out[r, :] = sv[r, :]
                    p_out[r, :] = sp[r, :]

            if RW > 8 * B:
                lane_octets.append(jnp.zeros((1, RW - 8 * B), f32))
            rows_out[pl.ds(i, 1), :] = jnp.concatenate(lane_octets, axis=1)
            return (tuple(new_done), tuple(new_conv), e_t, z_t, pl_t,
                    ru_t, rv_t, rp_t)

        zero_t = tuple(jnp.float32(0) for _ in range(B))
        init = (tuple(jnp.int32(0) for _ in range(B)),
                tuple(jnp.int32(-1) for _ in range(B)),
                zero_t, zero_t, zero_t, zero_t, zero_t, zero_t)
        # int32 bounds: see ops/pallas_aligned.py (Mosaic int promotion)
        done_t, conv_t, *_rest = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk), loop_body, init)
        for b in range(B):
            state_out[0, b] = done_t[b]
            state_out[0, B + b] = conv_t[b]

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((BN, nc), f32),
            jax.ShapeDtypeStruct((BN, nc), f32),
            jax.ShapeDtypeStruct((BN, nc), f32),
            jax.ShapeDtypeStruct((chunk, RW), f32),
            jax.ShapeDtypeStruct((1, 2 * B), jnp.int32),
        ),
        in_specs=[vmem() for _ in range(n_mats + n_sing + 6 + 3)]
        + [pl.BlockSpec((B, _N_SCAL), memory_space=pltpu.SMEM),
           pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(vmem(), vmem(), vmem(), vmem(),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        # su/sv/sp stage states + the six stacked stage-product buffers
        # (DU/DV/LXU/LXV/A5/A6) that let the elementwise path run batched
        scratch_shapes=[pltpu.VMEM((BN, nc), f32) for _ in range(9)],
        input_output_aliases={n_mats + n_sing + 6: 0,
                              n_mats + n_sing + 7: 1,
                              n_mats + n_sing + 8: 2},
        # the B-lane working set scales past the default ~16 MB scoped
        # budget well before physical VMEM (128 MB on v5e) runs out
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20) if not interpret else None),
        interpret=interpret,
    )
    mat_list = [mats[k] for k in mat_names]
    bord_u = jnp.stack([jnp.asarray(np.asarray(o.bc_u, np.float32))
                        for o in ops_list])
    bord_v = jnp.stack([jnp.asarray(np.asarray(o.bc_v, np.float32))
                        for o in ops_list])

    @jax.jit
    def chunk_fn(states: SpectralState, start_iter):
        # (B, nf, nf) -> row-stacked (B*nc, nc) cores
        u = states.u.astype(f32)[:, :nc, :nc].reshape(BN, nc)
        v = states.v.astype(f32)[:, :nc, :nc].reshape(BN, nc)
        p = jnp.zeros((B, nc, nc), f32).at[:, 1:ni + 1, 1:ni + 1].set(
            states.p.astype(f32)).reshape(BN, nc)
        iscal = jnp.asarray(start_iter, jnp.int32).reshape(1, 1)
        u, v, p, rows, flags = call(*mat_list, *sing_list, CU2, CCOL, CROW,
                                    INTR, NU_COL, BETA_COL,
                                    u, v, p, scal, iscal)
        # reassemble full grids: borders are the per-lane BC constants
        u_full = bord_u.at[:, :nc, :nc].set(u.reshape(B, nc, nc))
        v_full = bord_v.at[:, :nc, :nc].set(v.reshape(B, nc, nc))
        new_states = SpectralState(
            u=u_full, v=v_full,
            p=p.reshape(B, nc, nc)[:, 1:ni + 1, 1:ni + 1])
        done = flags[0, :B] > 0
        conv_iter = flags[0, B:]
        rows_b = jnp.stack(
            [rows[:, b * 8: b * 8 + N_COLS] for b in range(B)], axis=1)
        conv_row = jnp.maximum(conv_iter - 1 - start_iter, 0)
        ever_conv = done & jnp.isfinite(
            rows_b[conv_row, jnp.arange(B), 0])
        return new_states, done, conv_iter, ever_conv, rows_b

    return chunk_fn
