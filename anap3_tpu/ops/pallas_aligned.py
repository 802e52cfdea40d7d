"""MXU-aligned bordered-core chunk kernel (N % 8 == 0, N <= 320).

The tiled kernels (ops/pallas_tiled.py) pad the (N+1)-point grid to the
next 32 multiple: at N=128 every dot runs at (320,160)@(160,160) = 12 MXU
tile passes for ~1 tile of useful work, and the measured step rate sits
exactly at the MXU pass-issue bound (48.4k steps/s = 1060 passes x 19.5 ns
at N=128) — the headline size wastes ~6x of its MXU issue slots on
ceil(129/128) padding.

This module removes the padding instead of paying it. The key observation:
in the cavity problem every BORDER value of the state is a per-run
CONSTANT — u's last column is the (corner-treated) lid profile, u's last
row and all of v's borders are 0, and the PN-PN-2 pressure lives strictly
inside the grid (reference src/solvers/spectral/sg.py:103-119,348-385; BCs
re-enforced after every stage keep them constant). Splitting each
(N+1)-point axis as [core = first N points | border = last point], the
whole RK4 update of the evolving core needs ONLY:

- core x core dots — (N, N) operands, perfectly tiled on the MXU
  (2 passes where the padded kernel pays 12 at N=128);
- plus per-run constants: the lid column's contribution to a right
  product is ``lid (x) D[border, :core]`` — a rank-1 matrix precomputed on
  the host (CU2) and added with one VPU op; every other border term of
  the core residuals is exactly zero (v and p borders vanish, and the
  embedded inner-grid pressure operators have a zero border row).

Border values of the residuals/fields are needed only for diagnostics —
the last-stage residual norms (reference _compute_algebraic_residuals,
base.py:259-261) and the conserved-quantity quadratures (sg.py:495-550)
sum over the FULL grid. Those border strips are completed exactly, once
per step, from a handful of thin (8,N)x(N,N) / (N,N)x(N,8) dots plus
precomputed constant strips — a few extra MXU passes instead of a 6x tax
on every stage dot.

Same contract and state machine as ops/pallas_tiled.make_tiled_chunk_runner
(rel_iter + residual criteria, warmup gate, NaN freeze, metrics_every);
drop-in at the sizes it supports. The x3 bf16 decomposition is the
production algorithm; "x6" (f32 HIGHEST) is available for validation.

SINGULAR MODE (corner_treatment="singular", ops/singular.py) is supported
by the same decomposition: the state is the smooth remainder u_tilde whose
border values are still per-run constants (sharp BC minus the sampled
corner flow), merely nonzero on every wall now. The generalization costs
- rank-1 completions for the nonzero u-row / v-column / v-row borders
  (CLU/CLV left, CV2 right — precomputed dense, one VPU add each),
- seven sampled singular constant fields entering convection and the
  conserved-quantity quadratures exactly as in the tiled kernel
  (sing_dudy/sing_dvdy via the curl/div identities), and
- generalized constant border strips for the full-grid diagnostics
  (total wall velocities vanish, so strip convection stays precomputable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.spectral_sg import SpectralOps, SpectralState
from .pallas_tiled import _DotEngine, _RK4_ALPHAS, N_COLS

__all__ = ["make_aligned_chunk_runner", "make_aligned_tau_step",
           "aligned_supported", "MAX_ALIGNED_N", "MAX_ALIGNED_SINGULAR_N"]

# Size ceiling. The bordered-core decomposition is size-generic (every
# border is a per-run constant at any N); the only real requirements are
# sublane alignment of the core (N % 8 == 0) and VMEM. At N=320 the x3
# working set is ~14 MB — over the default ~16 MB scoped budget once the
# compiler's stage temporaries are counted, so kernels above N=256 request
# a raised per-kernel vmem_limit_bytes (the v5e has 128 MB physical VMEM,
# see ops/pallas_tiled.py). Above 320 the tiled row-blocked kernels take
# over (they bound the row-phase temporaries; this kernel does not).
MAX_ALIGNED_N = 320
# Singular mode adds the nine (N, N) constant fields plus CV2/CLU/CLV
# (~7 MB of extra VMEM constants at N=320). Round 4 kept a 256 ceiling by
# analogy with the tiled tier's OOM above 256; measured this round on a
# v5e under the same raised vmem_limit_bytes the plain tier already uses
# above N=256 (VERDICT r4 #6): singular N=320 x3 compiles and runs
# (13.0k steps/s vs 14.2k non-singular — the extra VPU adds), parity to
# the tiled singular kernel held. The ceiling is now the tier's own.
MAX_ALIGNED_SINGULAR_N = 320

_MAT_NAMES = ("DX2", "PX2", "DY2", "Dx", "DyT", "IyT", "GyT",
              "RCOLS", "LROWS")

# SMEM scalar layout (1, 24). Border constants are computed in their GENERAL
# form (arbitrary constant borders) so the same kernel expressions serve both
# the regularized-lid mode (u row / v borders = 0) and the singular mode
# (every border of the smooth remainder is a nonzero per-run constant).
(_NU, _BETA, _CFL, _LID, _IDX, _IDY, _LIDB, _DYT_BB, _DYYT_BB,
 _UBORD_SQ, _E_BORD, _CONV_BB, _LAPU_BB, _OM_BB, _WBB, _DX_BB,
 _VBORD_SQ, _CONVV_BB, _LAPV_BB) = range(19)
_N_SCAL = 24

# CCOL column layout (nc, 128): per-run constant COLUMN strips (j = N)
(_C_UCOL, _C_CONVU, _C_DUDXX, _C_WCOL, _C_DXCB, _C_IYTCB, _C_GYTCB,
 _C_DYTCB, _C_CONVV, _C_DVDX, _C_DVDXX, _C_VCOL, _C_SW, _C_SDWX,
 _C_SDWY) = range(15)

# CROW row layout (8, nc): per-run constant ROW strips (i = N)
(_R_DYTBC, _R_LAPU, _R_WROW, _R_LAPV, _R_OM, _R_SW, _R_SDWX,
 _R_SDWY) = range(8)


def aligned_supported(n: int, singular: bool = False) -> bool:
    """True when the bordered-core kernel covers polynomial order ``n``.

    The core (first N points per axis) must be sublane-aligned
    (N % 8 == 0); below N=32 the fixed per-step state-machine cost
    dominates and the whole-step kernels win, so the tier opts out there.
    """
    cap = MAX_ALIGNED_SINGULAR_N if singular else MAX_ALIGNED_N
    return n % 8 == 0 and 32 <= n <= cap


def _prep_aligned(ops: SpectralOps, algorithm: str):
    """Host-side: core operator blocks, thin border operators, constants."""
    nf = ops.bc_u.shape[0]
    nc = nf - 1
    ni = nf - 2
    if not aligned_supported(nc, singular=ops.sing_u is not None):
        raise ValueError(
            f"aligned kernel supports N % 8 == 0, 32 <= N <= "
            f"{MAX_ALIGNED_N} ({MAX_ALIGNED_SINGULAR_N} singular) "
            f"(got N={nc})")

    A = lambda x: np.asarray(x, np.float64)
    Dx, DyT = A(ops.Dx), A(ops.DyT)
    Dxx, DyyT = A(ops.Dxx), A(ops.DyyT)
    # embedded inner-grid pressure operators (full-grid form, ring offset 1)
    Gxe = np.zeros((nf, nf))
    Gxe[:, 1:1 + ni] = A(ops.Gx)
    Ixe = np.zeros((nf, nf))
    Ixe[:, 1:1 + ni] = A(ops.Ix)
    IyTe = np.zeros((nf, nf))
    IyTe[1:1 + ni, :] = A(ops.IyT)
    GyTe = np.zeros((nf, nf))
    GyTe[1:1 + ni, :] = A(ops.GyT)

    cc = lambda a: a[:nc, :nc]
    raw = {
        "DX2": np.vstack([cc(Dx), cc(Dxx)]),
        "PX2": np.vstack([cc(Gxe), cc(Ixe)]),
        "DY2": np.hstack([cc(DyT), cc(DyyT)]),
        "Dx": cc(Dx), "DyT": cc(DyT), "IyT": cc(IyTe), "GyT": cc(GyTe),
    }
    # thin border operators: RCOLS packs the border COLUMNS the right-side
    # thin dots contract into; LROWS the border ROWS for left-side thins
    rcols = np.zeros((nc, 128))
    rcols[:, 0] = DyT[:nc, nc]
    rcols[:, 1] = DyyT[:nc, nc]
    rcols[:, 2] = IyTe[:nc, nc]
    rcols[:, 3] = GyTe[:nc, nc]
    raw["RCOLS"] = rcols
    lrows = np.zeros((8, nc))
    lrows[0] = Dx[nc, :nc]
    lrows[1] = Dxx[nc, :nc]
    lrows[2] = Gxe[nc, :nc]
    lrows[3] = Ixe[nc, :nc]
    raw["LROWS"] = lrows

    mats = {}
    for name in _MAT_NAMES:
        a32 = raw[name].astype(np.float32)
        if algorithm in ("x3", "x1"):
            # x1 consumes only the hi halves in its dots; lo is still
            # shipped so the exact f32 LROWS reconstruction (hi + lo) in
            # the thin corner dots stays available
            hi = a32.astype(jnp.bfloat16)
            lo = (a32 - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            mats[name + "_hi"] = jnp.asarray(hi)
            mats[name + "_lo"] = jnp.asarray(lo)
            if name in ("IyT", "GyT") and algorithm == "x3":
                # precomputed [hi | lo] column concat for right_hl (the
                # doubled width hits exact 128-multiples at N in {192,320})
                mats[name + "_hilo"] = jnp.asarray(
                    np.concatenate([np.asarray(hi), np.asarray(lo)], axis=1))
        else:
            mats[name] = jnp.asarray(a32)

    sing = ops.sing_u is not None
    bcu, bcv = A(ops.bc_u), A(ops.bc_v)
    # constant borders of the STATE: column strip j=N, row strip i=N, corner
    ucol, urow, ubb = bcu[:nc, nc], bcu[nc, :nc], float(bcu[nc, nc])
    vcol, vrow, vbb = bcv[:nc, nc], bcv[nc, :nc], float(bcv[nc, nc])
    W2d = A(ops.W2d)
    if sing:
        s_u, s_v = A(ops.sing_u), A(ops.sing_v)
        s_dudx, s_dvdx = A(ops.sing_dudx), A(ops.sing_dvdx)
        s_w, s_dwx, s_dwy = A(ops.sing_w), A(ops.sing_dwx), A(ops.sing_dwy)
    else:
        s_u = s_v = s_dudx = s_dvdx = s_w = s_dwx = s_dwy = \
            np.zeros((nf, nf))
    # TOTAL border velocities (state + singular samples): on the walls these
    # cancel exactly; on the lid column they equal the (sharp or treated) lid
    utot_col, utot_bb = ucol + s_u[:nc, nc], ubb + float(s_u[nc, nc])
    utot_row = urow + s_u[nc, :nc]
    vtot_col, vtot_row = vcol + s_v[:nc, nc], vrow + s_v[nc, :nc]
    assert np.allclose(vtot_col, 0) and np.allclose(vtot_row, 0) \
        and np.allclose(utot_row, 0), "wall totals must vanish"

    # border columns' rank-1 contributions to RU/RV = state @ [DyT | DyyT]
    dy2row = np.concatenate([DyT[nc, :nc], DyyT[nc, :nc]])
    mats["CU2"] = jnp.asarray(np.outer(ucol, dy2row), jnp.float32)
    if sing:
        mats["CV2"] = jnp.asarray(np.outer(vcol, dy2row), jnp.float32)
        # border rows' rank-1 contributions to LU/LV = [Dx; Dxx] @ state
        dx2col = np.concatenate([Dx[:nc, nc], Dxx[:nc, nc]])
        mats["CLU"] = jnp.asarray(np.outer(dx2col, urow), jnp.float32)
        mats["CLV"] = jnp.asarray(np.outer(dx2col, vrow), jnp.float32)
        # constant core fields: stage BC values + the singular samples
        # (sing_dudy / sing_dvdy via the curl/div identities, as in
        # pallas_tiled._SING_NAMES)
        for name, arr in (("BCU", bcu), ("BCV", bcv), ("SU", s_u),
                          ("SV", s_v), ("SDUDX", s_dudx),
                          ("SDVDX", s_dvdx), ("SW", s_w),
                          ("SDWX", s_dwx), ("SDWY", s_dwy)):
            mats[name] = jnp.asarray(arr[:nc, :nc], jnp.float32)

    # constant parts of the j=N column strips (all f64 host math)
    dudx_cb = Dx[:nc, :nc] @ ucol + Dx[:nc, nc] * ubb
    dvdx_cb = Dx[:nc, :nc] @ vcol + Dx[:nc, nc] * vbb
    ccol = np.zeros((nc, 128))
    ccol[:, _C_UCOL] = ucol
    ccol[:, _C_CONVU] = utot_col * (dudx_cb + s_dudx[:nc, nc])
    ccol[:, _C_DUDXX] = Dxx[:nc, :nc] @ ucol + Dxx[:nc, nc] * ubb
    ccol[:, _C_WCOL] = W2d[:nc, nc]
    ccol[:, _C_DXCB] = Dx[:nc, nc]
    ccol[:, _C_IYTCB] = IyTe[:nc, nc]
    ccol[:, _C_GYTCB] = GyTe[:nc, nc]
    ccol[:, _C_DYTCB] = DyT[:nc, nc]
    ccol[:, _C_CONVV] = utot_col * (dvdx_cb + s_dvdx[:nc, nc])
    ccol[:, _C_DVDX] = dvdx_cb
    ccol[:, _C_DVDXX] = Dxx[:nc, :nc] @ vcol + Dxx[:nc, nc] * vbb
    ccol[:, _C_VCOL] = vcol
    ccol[:, _C_SW] = s_w[:nc, nc]
    ccol[:, _C_SDWX] = s_dwx[:nc, nc]
    ccol[:, _C_SDWY] = s_dwy[:nc, nc]
    mats["CCOL"] = jnp.asarray(ccol, jnp.float32)

    crow = np.zeros((8, nc))
    crow[_R_DYTBC] = DyT[nc, :nc]
    crow[_R_LAPU] = Dxx[nc, nc] * urow + urow @ DyyT[:nc, :nc] \
        + ubb * DyyT[nc, :nc]
    crow[_R_WROW] = W2d[nc, :nc]
    crow[_R_LAPV] = Dxx[nc, nc] * vrow + vrow @ DyyT[:nc, :nc] \
        + vbb * DyyT[nc, :nc]
    crow[_R_OM] = Dx[nc, nc] * vrow - urow @ DyT[:nc, :nc] \
        - ubb * DyT[nc, :nc]
    crow[_R_SW] = s_w[nc, :nc]
    crow[_R_SDWX] = s_dwx[nc, :nc]
    crow[_R_SDWY] = s_dwy[nc, :nc]
    mats["CROW"] = jnp.asarray(crow, jnp.float32)

    mats["interior"] = jnp.asarray(
        A(ops.interior)[:nc, :nc], jnp.float32)
    mats["W2d"] = jnp.asarray(W2d[:nc, :nc], jnp.float32)

    dudx_bb = float(Dx[nc, :nc] @ ucol + Dx[nc, nc] * ubb)
    dvdx_bb = float(Dx[nc, :nc] @ vcol + Dx[nc, nc] * vbb)
    scal = np.zeros(_N_SCAL)
    scal[_NU] = float(ops.nu)
    scal[_BETA] = float(ops.beta_sq)
    scal[_CFL] = float(ops.CFL)
    scal[_LID] = float(ops.lid_velocity)
    scal[_IDX] = float(ops.inv_dx_min)
    scal[_IDY] = float(ops.inv_dy_min)
    scal[_LIDB] = ubb  # kept for layout stability (reads folded into _R_OM)
    scal[_DYT_BB] = DyT[nc, nc]
    scal[_DYYT_BB] = DyyT[nc, nc]
    scal[_UBORD_SQ] = float(ucol @ ucol + ubb**2 + urow @ urow)
    scal[_VBORD_SQ] = float(vcol @ vcol + vbb**2 + vrow @ vrow)
    # border energy / corner residual constants run over TOTALS
    scal[_E_BORD] = 0.5 * float(
        W2d[:nc, nc] @ (utot_col**2 + vtot_col**2)
        + W2d[nc, nc] * utot_bb**2
        + W2d[nc, :nc] @ (utot_row**2 + vtot_row**2))
    scal[_CONV_BB] = utot_bb * (dudx_bb + float(s_dudx[nc, nc]))
    scal[_CONVV_BB] = utot_bb * (dvdx_bb + float(s_dvdx[nc, nc]))
    scal[_LAPU_BB] = float(Dxx[nc, :nc] @ ucol + Dxx[nc, nc] * ubb
                           + urow @ DyyT[:nc, nc] + ubb * DyyT[nc, nc])
    scal[_LAPV_BB] = float(Dxx[nc, :nc] @ vcol + Dxx[nc, nc] * vbb
                           + vrow @ DyyT[:nc, nc] + vbb * DyyT[nc, nc])
    scal[_OM_BB] = float(Dx[nc, :nc] @ vcol + Dx[nc, nc] * vbb
                         - urow @ DyT[:nc, nc] - ubb * DyT[nc, nc])
    scal[_WBB] = W2d[nc, nc]
    scal[_DX_BB] = Dx[nc, nc]
    return (mats, jnp.asarray(scal, jnp.float32).reshape(1, _N_SCAL),
            nf, ni, nc)


def _corner_dot(row, col):
    """(1, nc) x (nc, 1) -> scalar, full f32 accuracy (single tiny dot)."""
    return jax.lax.dot_general(
        row, col, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)[0, 0]


def make_aligned_chunk_runner(ops: SpectralOps, chunk: int, tolerance: float,
                              warmup: int, interpret: bool = False,
                              algorithm: str = "x3",
                              convergence_metric: str = "rel_iter",
                              metrics_every: int = 1):
    """Drop-in for make_tiled_chunk_runner at N in {128, 256}.

    Same contract: ``chunk_fn(state, start_iter, ref_norm) -> (state, done,
    conv_iter, converged, rows, ref_norm)`` with rows (chunk, N_COLS) in
    runner.METRIC_KEYS order.

    ``algorithm="x1"`` runs every stage dot as ONE bf16 MXU pass (the
    bf16-state throughput experiment, VERDICT r4 #4) — explicit opt-in
    via ``matmul_algorithm: x1`` only, never selected by ``auto``.
    """
    if algorithm not in ("x1", "x3", "x6"):
        raise ValueError(f"unknown matmul algorithm {algorithm!r}")
    use_residual = convergence_metric == "residual"
    metrics_every = max(1, int(metrics_every))
    # the 'residual' criterion consumes the continuity norm every step;
    # the others only display it, so it follows the metrics decimation
    res_every = 1 if use_residual else metrics_every
    mats, scal, nf, ni, nc = _prep_aligned(ops, algorithm)
    f32 = jnp.float32
    mat_names = list(mats)
    n_mats = len(mat_names)
    chunk = int(chunk)

    def kernel(*args):
        refs = dict(zip(mat_names, args[:n_mats]))
        (u_in, v_in, p_in, scal_ref, iscal_ref, rnorm_ref,
         u_out, v_out, p_out, rows_out, state_out, rnorm_out,
         su, sv, sp, bu, bv, bp, LU, LV, LP) = args[n_mats:]

        eng = _DotEngine(algorithm, refs)
        start_iter = iscal_ref[0, 0]
        u_out[:] = u_in[:]
        v_out[:] = v_in[:]
        p_out[:] = p_in[:]

        intr = refs["interior"][:]
        w2d = refs["W2d"][:]
        cu2 = refs["CU2"][:]
        ccol = refs["CCOL"]
        crow = refs["CROW"]
        s = lambda i: scal_ref[0, i]
        nu = s(_NU)
        beta_sq = s(_BETA)
        sing = "SU" in refs

        def col(i):
            return ccol[:, i:i + 1]

        def row(i):
            return crow[i:i + 1, :]

        def run_stage(adt, accumulate: bool):
            """One RK stage on the core; returns border-complete residual
            norm accumulators when ``accumulate`` (the last stage)."""
            u_c = eng.cache(su[:])
            v_c = eng.cache(sv[:])
            p_c = eng.cache(sp[:])
            lu2, lv2 = eng.left2("DX2", u_c, v_c)  # [Dx@u;Dxx@u],[Dx@v;Dxx@v]
            LU[:] = lu2
            LV[:] = lv2
            if sing:                          # border-row rank-1 completions
                LU[:] = LU[:] + refs["CLU"][:]
                LV[:] = LV[:] + refs["CLV"][:]
            LP[:] = eng.left_hl("PX2", p_c)      # [a5 ; a6] core
            a5_c = eng.cache(LP[0:nc, :])
            a6_c = eng.cache(LP[nc:2 * nc, :])

            RU = eng.right(u_c, "DY2") + cu2  # border-column completion
            RV = eng.right(v_c, "DY2")
            if sing:
                RV = RV + refs["CV2"][:]
            dpx = eng.right_hl(a5_c, "IyT")
            dpy = eng.right_hl(a6_c, "GyT")

            u_b = su[:]
            v_b = sv[:]
            du_dx = LU[0:nc, :]
            dv_dx = LV[0:nc, :]
            du_dy = RU[:, 0:nc]
            dv_dy = RV[:, 0:nc]
            lap_u = LU[nc:2 * nc, :] + RU[:, nc:2 * nc]
            lap_v = LV[nc:2 * nc, :] + RV[:, nc:2 * nc]
            if sing:
                # convection rides the TOTAL velocity; the singular
                # derivatives are sampled constants (identities:
                # s_dudy = s_dvdx - s_w, s_dvdy = -s_dudx)
                U = u_b + refs["SU"][:]
                V = v_b + refs["SV"][:]
                s_dudx = refs["SDUDX"][:]
                s_dvdx = refs["SDVDX"][:]
                s_dudy = s_dvdx - refs["SW"][:]
                R_u = -(U * (du_dx + s_dudx) + V * (du_dy + s_dudy)) \
                    - dpx + nu * lap_u
                R_v = -(U * (dv_dx + s_dvdx) + V * (dv_dy - s_dudx)) \
                    - dpy + nu * lap_v
            else:
                R_u = -(u_b * du_dx + v_b * du_dy) - dpx + nu * lap_u
                R_v = -(u_b * dv_dx + v_b * dv_dy) - dpy + nu * lap_v
            R_p = -beta_sq * (du_dx + dv_dy) * intr

            if sing:
                su[:] = jnp.where(intr > 0.5, bu[:] + adt * R_u,
                                  refs["BCU"][:])
                sv[:] = jnp.where(intr > 0.5, bv[:] + adt * R_v,
                                  refs["BCV"][:])
            else:
                su[:] = jnp.where(intr > 0.5, bu[:] + adt * R_u, 0.0)
                sv[:] = jnp.where(intr > 0.5, bv[:] + adt * R_v, 0.0)
            sp[:] = bp[:] + adt * R_p
            if not accumulate:
                return None
            # hand the last stage's residuals + cached operands to the
            # (possibly decimated) residual-norm pass
            return R_u, R_v, R_p, u_c, v_c, p_c, a5_c, a6_c

        def res_pass(stage_out):
            """Full-grid residual norms: core + exact border strips.

            Runs every ``metrics_every``-th step (every step under the
            'residual' criterion, which consumes the continuity norm) —
            the strip completions cost a handful of thin MXU dots that
            the rel_iter/energy criteria never read."""
            R_u, R_v, R_p, u_c, v_c, p_c, a5_c, a6_c = stage_out
            acc_u = jnp.sum(R_u * R_u)
            acc_v = jnp.sum(R_v * R_v)
            acc_p = jnp.sum(R_p * R_p)   # interior-masked: borders are 0

            TU = eng.right(u_c, "RCOLS")     # cols: u@DyT_cb, u@DyyT_cb
            TV = eng.right(v_c, "RCOLS")
            T5 = eng.right(a5_c, "RCOLS")    # col 2: dpx column strip
            T6 = eng.right(a6_c, "RCOLS")    # col 3: dpy column strip
            Lu8, Lv8 = eng.left2("LROWS", u_c, v_c)  # Dx_bc@{u,v}, Dxx_bc@{u,v}
            Lp8 = eng.left("LROWS", p_c)     # rows 2,3: a5_bc, a6_bc

            # column strip (j = N): total v = 0 and total u is constant,
            # so the convection terms are precomputed (_C_CONVU/_C_CONVV)
            du_dyy_cb = TU[:, 1:2] + col(_C_UCOL) * s(_DYYT_BB)
            R_u_cb = (-col(_C_CONVU) - T5[:, 2:3]
                      + nu * (col(_C_DUDXX) + du_dyy_cb))
            dv_dyy_cb = TV[:, 1:2] + col(_C_VCOL) * s(_DYYT_BB)
            R_v_cb = (-col(_C_CONVV) - T6[:, 3:4]
                      + nu * (col(_C_DVDXX) + dv_dyy_cb))
            # row strip (i = N): total u = v = 0 there, convection vanishes
            a5_bc = Lp8[2:3, :]
            a6_bc = Lp8[3:4, :]
            dpx_bc = eng.right(eng.cache(a5_bc), "IyT")
            dpy_bc = eng.right(eng.cache(a6_bc), "GyT")
            R_u_bc = -dpx_bc + nu * (Lu8[1:2, :] + row(_R_LAPU))
            R_v_bc = -dpy_bc + nu * (Lv8[1:2, :] + row(_R_LAPV))
            # corner (N, N)
            dpx_bb = _corner_dot(a5_bc, col(_C_IYTCB))
            dpy_bb = _corner_dot(a6_bc, col(_C_GYTCB))
            R_u_bb = -s(_CONV_BB) - dpx_bb + nu * s(_LAPU_BB)
            R_v_bb = -s(_CONVV_BB) - dpy_bb + nu * s(_LAPV_BB)

            acc_u = (acc_u + jnp.sum(R_u_cb * R_u_cb)
                     + jnp.sum(R_u_bc * R_u_bc) + R_u_bb * R_u_bb)
            acc_v = (acc_v + jnp.sum(R_v_cb * R_v_cb)
                     + jnp.sum(R_v_bc * R_v_bc) + R_v_bb * R_v_bb)
            return jnp.sqrt(acc_u), jnp.sqrt(acc_v), jnp.sqrt(acc_p)

        def metrics_pass():
            """Full-grid conserved quantities from the core state + exact
            border strips (SMOOTH omega's borders are dynamic). In singular
            mode the quadratures run over totals: spectral dots act only on
            the smooth fields, the singular parts are sampled constants."""
            u_c = eng.cache(su[:])
            v_c = eng.cache(sv[:])
            # smooth omega core = dv/dx - du/dy (border completions: CU2's
            # left half for u's column, CLV's top half for v's row)
            omc = (eng.left("Dx", v_c)
                   - (eng.right(u_c, "DyT") + cu2[:, 0:nc]))
            if sing:
                omc = omc + refs["CLV"][0:nc, :]
            om_cb = col(_C_DVDX) - (eng.right(u_c, "RCOLS")[:, 0:1]
                                    + col(_C_UCOL) * s(_DYT_BB))  # (nc, 1)
            om_bc = eng.left("LROWS", v_c)[0:1, :] + row(_R_OM)   # (1, nc)
            om_bb = s(_OM_BB)

            if sing:
                u_t = su[:] + refs["SU"][:]
                v_t = sv[:] + refs["SV"][:]
                om_t = omc + refs["SW"][:]
                om_cb_t = om_cb + col(_C_SW)
                om_bc_t = om_bc + row(_R_SW)
            else:
                u_t, v_t = su[:], sv[:]
                om_t, om_cb_t, om_bc_t = omc, om_cb, om_bc
            energy = 0.5 * jnp.sum(w2d * (u_t * u_t + v_t * v_t)) \
                + s(_E_BORD)
            enstrophy = 0.5 * (
                jnp.sum(w2d * om_t * om_t)
                + jnp.sum(col(_C_WCOL) * om_cb_t * om_cb_t)
                + jnp.sum(row(_R_WROW) * om_bc_t * om_bc_t)
                + s(_WBB) * om_bb * om_bb)  # singular samples vanish at (N,N)

            om_c = eng.cache(omc)
            dwx = eng.left("Dx", om_c) + col(_C_DXCB) * om_bc
            dwy = eng.right(om_c, "DyT") + om_cb * row(_R_DYTBC)
            if sing:
                dwx = dwx + refs["SDWX"][:]
                dwy = dwy + refs["SDWY"][:]
            pal = jnp.sum(w2d * (dwx * dwx + dwy * dwy))
            # border strips of grad(omega) (+ sampled singular strips)
            omcb_c = eng.cache(om_cb)
            ombc_c = eng.cache(om_bc)
            dwx_cb = eng.left("Dx", omcb_c) + col(_C_DXCB) * om_bb \
                + col(_C_SDWX)
            dwy_cb = eng.right(om_c, "RCOLS")[:, 0:1] + om_cb * s(_DYT_BB) \
                + col(_C_SDWY)
            dwx_bc = eng.left("LROWS", om_c)[0:1, :] + s(_DX_BB) * om_bc \
                + row(_R_SDWX)
            dwy_bc = eng.right(ombc_c, "DyT") + om_bb * row(_R_DYTBC) \
                + row(_R_SDWY)
            # corner: dwx(N,N) = Dx_bc @ om_cb + Dx_bb * om_bb
            dwx_bb = _corner_dot(eng_lrow_dx(), om_cb) + s(_DX_BB) * om_bb
            dwy_bb = _corner_dot(om_bc, col(_C_DYTCB)) \
                + om_bb * s(_DYT_BB)
            pal = pal + jnp.sum(col(_C_WCOL) * (dwx_cb * dwx_cb
                                                + dwy_cb * dwy_cb)) \
                + jnp.sum(row(_R_WROW) * (dwx_bc * dwx_bc
                                          + dwy_bc * dwy_bc)) \
                + s(_WBB) * (dwx_bb * dwx_bb + dwy_bb * dwy_bb)
            return energy, enstrophy, 0.5 * pal

        def eng_lrow_dx():
            """Dx's border row as an f32 (1, nc) value for corner dots."""
            if eng.hl:
                return (refs["LROWS_hi"][0:1, :].astype(f32)
                        + refs["LROWS_lo"][0:1, :].astype(f32))
            return refs["LROWS"][0:1, :]

        def adaptive_dt():
            # wave speeds belong to the TOTAL velocity; the border totals
            # never exceed the lid speed, which clamps the max anyway
            u_eff = su[:] + refs["SU"][:] if sing else su[:]
            v_eff = sv[:] + refs["SV"][:] if sing else sv[:]
            u_max = jnp.maximum(jnp.max(jnp.abs(u_eff)), s(_LID))
            v_max = jnp.maximum(jnp.max(jnp.abs(v_eff)), 1e-10)
            lam_x = (u_max + jnp.sqrt(u_max * u_max + beta_sq)) * s(_IDX) \
                + nu * s(_IDX) * s(_IDX)
            lam_y = (v_max + jnp.sqrt(v_max * v_max + beta_sq)) * s(_IDY) \
                + nu * s(_IDY) * s(_IDY)
            return s(_CFL) / (lam_x + lam_y)

        def loop_body(i, carry):
            (done_i, conv_iter, ref_norm, e_c, z_c, pl_c,
             ru_c, rv_c, rp_c) = carry
            done = done_i > 0
            idx = start_iter + i

            su[:] = u_out[:]
            sv[:] = v_out[:]
            sp[:] = p_out[:]
            # full-grid norms = core + constant border mass
            u_prev_norm = jnp.sqrt(jnp.sum(u_out[:] * u_out[:])
                                   + s(_UBORD_SQ))
            v_prev_norm = jnp.sqrt(jnp.sum(v_out[:] * v_out[:])
                                   + s(_VBORD_SQ))
            bu[:] = u_out[:]
            bv[:] = v_out[:]
            bp[:] = p_out[:]

            dt = adaptive_dt()
            stage_out = None
            for k, alpha in enumerate(_RK4_ALPHAS):
                stage_out = run_stage(alpha * dt,
                                      accumulate=(k == len(_RK4_ALPHAS) - 1))
            # the held carries initialize to 0.0 each chunk call, so the
            # FIRST step of a chunk always runs a fresh pass: a chunk
            # whose length is not a metrics_every multiple (clamped
            # budgets, custom chunk_size) would otherwise record zeros
            # until the global cadence next fires
            if res_every == 1:
                r_un, r_vn, r_pn = res_pass(stage_out)
            else:
                r_un, r_vn, r_pn = jax.lax.cond(
                    (i == jnp.int32(0))
                    | (idx % jnp.int32(res_every) == 0),
                    lambda: res_pass(stage_out),
                    lambda: (ru_c, rv_c, rp_c))
            if metrics_every == 1:
                energy, enstrophy, palinstrophy = metrics_pass()
            else:
                energy, enstrophy, palinstrophy = jax.lax.cond(
                    (i == jnp.int32(0))
                    | (idx % jnp.int32(metrics_every) == 0),
                    metrics_pass, lambda: (e_c, z_c, pl_c))

            du = jnp.sqrt(jnp.sum((su[:] - bu[:]) ** 2))
            dv = jnp.sqrt(jnp.sum((sv[:] - bv[:]) ** 2))
            rel = jnp.maximum(du / (u_prev_norm + 1e-12),
                              dv / (v_prev_norm + 1e-12))

            nan = jnp.float32(jnp.nan)
            row_v = jnp.stack([
                jnp.where(done, nan, rel),
                jnp.where(done, nan, r_un),
                jnp.where(done, nan, r_vn),
                jnp.where(done, nan, r_pn),
                jnp.where(done, nan, energy),
                jnp.where(done, nan, enstrophy),
                jnp.where(done, nan, palinstrophy),
            ]).reshape(1, N_COLS)
            rows_out[pl.ds(i, 1), :] = row_v

            if use_residual:
                cont = r_pn
                ref_norm = jnp.where(idx == warmup, cont, ref_norm)
                crit = cont / jnp.maximum(ref_norm, 1e-30)
            else:
                crit = rel
            finite = jnp.isfinite(rel)
            newly_conv = (idx >= warmup) & (crit < tolerance) & finite
            newly_div = ~finite & ~done
            now_done = done | newly_conv | newly_div
            conv_iter = jnp.where(~done & now_done, idx + 1, conv_iter)

            @pl.when(jnp.logical_not(done))
            def _commit():
                u_out[:] = su[:]
                v_out[:] = sv[:]
                p_out[:] = sp[:]

            return (now_done.astype(jnp.int32), conv_iter, ref_norm,
                    energy, enstrophy, palinstrophy, r_un, r_vn, r_pn)

        zero = jnp.float32(0.0)
        # int32 bounds: under jax_enable_x64 plain Python bounds would make
        # the loop index int64, which Mosaic's tracer cannot mix with the
        # int32 SMEM scalars (RecursionError in the int promotion)
        done_i, conv_iter, ref_norm, *_rest = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk), loop_body,
            (jnp.int32(0), jnp.int32(-1), rnorm_ref[0, 0],
             zero, zero, zero, zero, zero, zero))
        state_out[0, 0] = done_i
        state_out[0, 1] = conv_iter
        rnorm_out[0, 0] = ref_norm

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nc, nc), f32),
            jax.ShapeDtypeStruct((nc, nc), f32),
            jax.ShapeDtypeStruct((nc, nc), f32),
            jax.ShapeDtypeStruct((chunk, N_COLS), f32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        in_specs=[vmem() for _ in range(n_mats + 3)]
        + [pl.BlockSpec((1, _N_SCAL), memory_space=pltpu.SMEM),
           pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
           pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(vmem(), vmem(), vmem(), vmem(),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((nc, nc), f32) for _ in range(6)]
        + [pltpu.VMEM((2 * nc, nc), f32) for _ in range(3)],
        # N=320's x3 working set (~14 MB + stage temporaries) exceeds the
        # default ~16 MB scoped VMEM budget; request more (128 MB physical)
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
                         if nc > 256 and not interpret else None),
        interpret=interpret,
    )
    mat_list = [mats[k] for k in mat_names]
    bord_u = jnp.asarray(np.asarray(ops.bc_u, np.float32))
    bord_v = jnp.asarray(np.asarray(ops.bc_v, np.float32))

    @jax.jit
    def chunk_fn(state: SpectralState, start_iter, ref_norm):
        u = state.u.astype(f32)[:nc, :nc]
        v = state.v.astype(f32)[:nc, :nc]
        p = jnp.zeros((nc, nc), f32).at[1:ni + 1, 1:ni + 1].set(
            state.p.astype(f32))
        iscal = jnp.asarray(start_iter, jnp.int32).reshape(1, 1)
        rscal = jnp.asarray(ref_norm, f32).reshape(1, 1)
        u, v, p, rows, flags, rnorm = call(*mat_list, u, v, p, scal, iscal,
                                           rscal)
        # reassemble the full grid: borders are the per-run BC constants
        # (the core overwrite restores the interior AND the core-edge walls)
        u_full = bord_u.at[:nc, :nc].set(u)
        v_full = bord_v.at[:nc, :nc].set(v)
        new_state = SpectralState(u=u_full, v=v_full,
                                  p=p[1:ni + 1, 1:ni + 1])
        done = flags[0, 0] > 0
        conv_iter = flags[0, 1]
        converged = done & jnp.isfinite(
            rows[jnp.maximum(conv_iter - 1 - start_iter, 0), 0])
        return new_state, done, conv_iter, converged, rows, rnorm[0, 0]

    return chunk_fn


def make_aligned_tau_step(ops: SpectralOps, interpret: bool = False,
                          algorithm: str = "x6"):
    """FAS-forced single RK4 step on the bordered core — the drop-in for
    ops.pallas_tiled.make_tiled_sg_step(with_tau=True) at aligned sizes.

    V-cycle smoothing is the dominant VMG/FMG cost and runs at x6 (full
    f32 accuracy: the FAS tau cancellation needs the smoother's residual
    operator to match the XLA-HIGHEST defect operator — see
    models/spectral_vmg.build_fused_tau_steps). On the padded tiled layout
    an x6 stage dot at N=128 pays 12 MXU tiles for ~2 of useful work; the
    bordered core removes that exactly as in the chunk kernel above.

    Signature: ``step(state, (tau_u, tau_v, tau_p)) -> (state, metrics)``
    with metrics keys u_eq/v_eq/continuity/energy/enstrophy/palinstrophy.
    tau is added to every stage residual (core.sg_step's hook); the
    residual norms include it. FAS tau is ZERO on the velocity boundary
    ring by construction (make_v_cycle zeroes the defect there), so the
    constant border strips of the residual norms are unchanged by tau.
    Supports the singular constants exactly as the chunk kernel.
    """
    if algorithm not in ("x1", "x3", "x6"):
        raise ValueError(f"unknown matmul algorithm {algorithm!r}")
    mats, scal, nf, ni, nc = _prep_aligned(ops, algorithm)
    f32 = jnp.float32
    mat_names = list(mats)
    n_mats = len(mat_names)

    def kernel(*args):
        refs = dict(zip(mat_names, args[:n_mats]))
        (u_in, v_in, p_in, tu_ref, tv_ref, tp_ref, scal_ref,
         u_out, v_out, p_out, metrics_out,
         su, sv, sp, LU, LV, LP) = args[n_mats:]

        eng = _DotEngine(algorithm, refs)
        u_out[:] = u_in[:]
        v_out[:] = v_in[:]
        p_out[:] = p_in[:]

        intr = refs["interior"][:]
        w2d = refs["W2d"][:]
        cu2 = refs["CU2"][:]
        ccol = refs["CCOL"]
        crow = refs["CROW"]
        s = lambda i: scal_ref[0, i]
        nu = s(_NU)
        beta_sq = s(_BETA)
        sing = "SU" in refs

        def col(i):
            return ccol[:, i:i + 1]

        def row(i):
            return crow[i:i + 1, :]

        def eng_lrow_dx():
            if eng.hl:
                return (refs["LROWS_hi"][0:1, :].astype(f32)
                        + refs["LROWS_lo"][0:1, :].astype(f32))
            return refs["LROWS"][0:1, :]

        su[:] = u_out[:]
        sv[:] = v_out[:]
        sp[:] = p_out[:]

        # CFL dt (identical to the chunk kernel's adaptive_dt)
        u_eff = su[:] + refs["SU"][:] if sing else su[:]
        v_eff = sv[:] + refs["SV"][:] if sing else sv[:]
        u_max = jnp.maximum(jnp.max(jnp.abs(u_eff)), s(_LID))
        v_max = jnp.maximum(jnp.max(jnp.abs(v_eff)), 1e-10)
        lam_x = (u_max + jnp.sqrt(u_max * u_max + beta_sq)) * s(_IDX) \
            + nu * s(_IDX) * s(_IDX)
        lam_y = (v_max + jnp.sqrt(v_max * v_max + beta_sq)) * s(_IDY) \
            + nu * s(_IDY) * s(_IDY)
        dt = s(_CFL) / (lam_x + lam_y)

        def run_stage(adt, accumulate):
            """Chunk-kernel stage + tau forcing (see make_aligned_chunk_
            runner.run_stage — same dots, same border completions)."""
            u_c = eng.cache(su[:])
            v_c = eng.cache(sv[:])
            p_c = eng.cache(sp[:])
            lu2, lv2 = eng.left2("DX2", u_c, v_c)
            LU[:] = lu2
            LV[:] = lv2
            if sing:
                LU[:] = LU[:] + refs["CLU"][:]
                LV[:] = LV[:] + refs["CLV"][:]
            LP[:] = eng.left_hl("PX2", p_c)
            a5_c = eng.cache(LP[0:nc, :])
            a6_c = eng.cache(LP[nc:2 * nc, :])
            RU = eng.right(u_c, "DY2") + cu2
            RV = eng.right(v_c, "DY2")
            if sing:
                RV = RV + refs["CV2"][:]
            dpx = eng.right_hl(a5_c, "IyT")
            dpy = eng.right_hl(a6_c, "GyT")
            u_b = su[:]
            v_b = sv[:]
            du_dx = LU[0:nc, :]
            dv_dx = LV[0:nc, :]
            du_dy = RU[:, 0:nc]
            dv_dy = RV[:, 0:nc]
            lap_u = LU[nc:2 * nc, :] + RU[:, nc:2 * nc]
            lap_v = LV[nc:2 * nc, :] + RV[:, nc:2 * nc]
            if sing:
                U = u_b + refs["SU"][:]
                V = v_b + refs["SV"][:]
                s_dudx = refs["SDUDX"][:]
                s_dvdx = refs["SDVDX"][:]
                s_dudy = s_dvdx - refs["SW"][:]
                R_u = -(U * (du_dx + s_dudx) + V * (du_dy + s_dudy)) \
                    - dpx + nu * lap_u + tu_ref[:]
                R_v = -(U * (dv_dx + s_dvdx) + V * (dv_dy - s_dudx)) \
                    - dpy + nu * lap_v + tv_ref[:]
            else:
                R_u = -(u_b * du_dx + v_b * du_dy) - dpx + nu * lap_u \
                    + tu_ref[:]
                R_v = -(u_b * dv_dx + v_b * dv_dy) - dpy + nu * lap_v \
                    + tv_ref[:]
            R_p = -beta_sq * (du_dx + dv_dy) * intr + tp_ref[:]

            if sing:
                su[:] = jnp.where(intr > 0.5, u_out[:] + adt * R_u,
                                  refs["BCU"][:])
                sv[:] = jnp.where(intr > 0.5, v_out[:] + adt * R_v,
                                  refs["BCV"][:])
            else:
                su[:] = jnp.where(intr > 0.5, u_out[:] + adt * R_u, 0.0)
                sv[:] = jnp.where(intr > 0.5, v_out[:] + adt * R_v, 0.0)
            sp[:] = p_out[:] + adt * R_p
            if not accumulate:
                return None

            # full-grid residual norms: core (incl. tau) + exact constant
            # border strips (tau vanishes on the velocity boundary ring)
            acc_u = jnp.sum(R_u * R_u)
            acc_v = jnp.sum(R_v * R_v)
            acc_p = jnp.sum(R_p * R_p)
            TU = eng.right(u_c, "RCOLS")
            TV = eng.right(v_c, "RCOLS")
            T5 = eng.right(a5_c, "RCOLS")
            T6 = eng.right(a6_c, "RCOLS")
            Lu8, Lv8 = eng.left2("LROWS", u_c, v_c)
            Lp8 = eng.left("LROWS", p_c)
            du_dyy_cb = TU[:, 1:2] + col(_C_UCOL) * s(_DYYT_BB)
            R_u_cb = (-col(_C_CONVU) - T5[:, 2:3]
                      + nu * (col(_C_DUDXX) + du_dyy_cb))
            dv_dyy_cb = TV[:, 1:2] + col(_C_VCOL) * s(_DYYT_BB)
            R_v_cb = (-col(_C_CONVV) - T6[:, 3:4]
                      + nu * (col(_C_DVDXX) + dv_dyy_cb))
            a5_bc = Lp8[2:3, :]
            a6_bc = Lp8[3:4, :]
            dpx_bc = eng.right(eng.cache(a5_bc), "IyT")
            dpy_bc = eng.right(eng.cache(a6_bc), "GyT")
            R_u_bc = -dpx_bc + nu * (Lu8[1:2, :] + row(_R_LAPU))
            R_v_bc = -dpy_bc + nu * (Lv8[1:2, :] + row(_R_LAPV))
            dpx_bb = _corner_dot(a5_bc, col(_C_IYTCB))
            dpy_bb = _corner_dot(a6_bc, col(_C_GYTCB))
            R_u_bb = -s(_CONV_BB) - dpx_bb + nu * s(_LAPU_BB)
            R_v_bb = -s(_CONVV_BB) - dpy_bb + nu * s(_LAPV_BB)
            acc_u = (acc_u + jnp.sum(R_u_cb * R_u_cb)
                     + jnp.sum(R_u_bc * R_u_bc) + R_u_bb * R_u_bb)
            acc_v = (acc_v + jnp.sum(R_v_cb * R_v_cb)
                     + jnp.sum(R_v_bc * R_v_bc) + R_v_bb * R_v_bb)
            return acc_u, acc_v, acc_p

        acc = None
        for k, alpha in enumerate(_RK4_ALPHAS):
            acc = run_stage(alpha * dt,
                            accumulate=(k == len(_RK4_ALPHAS) - 1))

        # conserved quantities of the post-step state (chunk kernel's
        # metrics_pass, verbatim semantics)
        u_c = eng.cache(su[:])
        v_c = eng.cache(sv[:])
        omc = (eng.left("Dx", v_c)
               - (eng.right(u_c, "DyT") + cu2[:, 0:nc]))
        if sing:
            omc = omc + refs["CLV"][0:nc, :]
        om_cb = col(_C_DVDX) - (eng.right(u_c, "RCOLS")[:, 0:1]
                                + col(_C_UCOL) * s(_DYT_BB))
        om_bc = eng.left("LROWS", v_c)[0:1, :] + row(_R_OM)
        om_bb = s(_OM_BB)
        if sing:
            u_t = su[:] + refs["SU"][:]
            v_t = sv[:] + refs["SV"][:]
            om_t = omc + refs["SW"][:]
            om_cb_t = om_cb + col(_C_SW)
            om_bc_t = om_bc + row(_R_SW)
        else:
            u_t, v_t = su[:], sv[:]
            om_t, om_cb_t, om_bc_t = omc, om_cb, om_bc
        energy = 0.5 * jnp.sum(w2d * (u_t * u_t + v_t * v_t)) + s(_E_BORD)
        enstrophy = 0.5 * (
            jnp.sum(w2d * om_t * om_t)
            + jnp.sum(col(_C_WCOL) * om_cb_t * om_cb_t)
            + jnp.sum(row(_R_WROW) * om_bc_t * om_bc_t)
            + s(_WBB) * om_bb * om_bb)
        om_c = eng.cache(omc)
        dwx = eng.left("Dx", om_c) + col(_C_DXCB) * om_bc
        dwy = eng.right(om_c, "DyT") + om_cb * row(_R_DYTBC)
        if sing:
            dwx = dwx + refs["SDWX"][:]
            dwy = dwy + refs["SDWY"][:]
        pal = jnp.sum(w2d * (dwx * dwx + dwy * dwy))
        omcb_c = eng.cache(om_cb)
        ombc_c = eng.cache(om_bc)
        dwx_cb = eng.left("Dx", omcb_c) + col(_C_DXCB) * om_bb
        dwy_cb = eng.right(om_c, "RCOLS")[:, 0:1] + om_cb * s(_DYT_BB)
        dwx_bc = eng.left("LROWS", om_c)[0:1, :] + s(_DX_BB) * om_bc
        dwy_bc = eng.right(ombc_c, "DyT") + om_bb * row(_R_DYTBC)
        if sing:
            dwx_cb = dwx_cb + col(_C_SDWX)
            dwy_cb = dwy_cb + col(_C_SDWY)
            dwx_bc = dwx_bc + row(_R_SDWX)
            dwy_bc = dwy_bc + row(_R_SDWY)
        dwx_bb = _corner_dot(eng_lrow_dx(), om_cb) + s(_DX_BB) * om_bb
        dwy_bb = _corner_dot(om_bc, col(_C_DYTCB)) + om_bb * s(_DYT_BB)
        pal = pal + jnp.sum(col(_C_WCOL) * (dwx_cb * dwx_cb
                                            + dwy_cb * dwy_cb)) \
            + jnp.sum(row(_R_WROW) * (dwx_bc * dwx_bc
                                      + dwy_bc * dwy_bc)) \
            + s(_WBB) * (dwx_bb * dwx_bb + dwy_bb * dwy_bb)

        u_out[:] = su[:]
        v_out[:] = sv[:]
        p_out[:] = sp[:]
        metrics_out[0, :] = jnp.stack([
            jnp.sqrt(acc[0]), jnp.sqrt(acc[1]), jnp.sqrt(acc[2]),
            energy, enstrophy, 0.5 * pal,
        ])

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nc, nc), f32),
            jax.ShapeDtypeStruct((nc, nc), f32),
            jax.ShapeDtypeStruct((nc, nc), f32),
            jax.ShapeDtypeStruct((1, 6), f32),
        ),
        in_specs=[vmem() for _ in range(n_mats + 6)]
        + [pl.BlockSpec((1, _N_SCAL), memory_space=pltpu.SMEM)],
        out_specs=(vmem(), vmem(), vmem(), vmem()),
        scratch_shapes=[pltpu.VMEM((nc, nc), f32) for _ in range(3)]
        + [pltpu.VMEM((2 * nc, nc), f32) for _ in range(3)],
        input_output_aliases={n_mats: 0, n_mats + 1: 1, n_mats + 2: 2},
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
                         if nc > 256 and not interpret else None),
        interpret=interpret,
    )
    mat_list = [mats[k] for k in mat_names]
    bord_u = jnp.asarray(np.asarray(ops.bc_u, np.float32))
    bord_v = jnp.asarray(np.asarray(ops.bc_v, np.float32))

    def step(state: SpectralState, tau):
        u = state.u.astype(f32)[:nc, :nc]
        v = state.v.astype(f32)[:nc, :nc]
        p = jnp.zeros((nc, nc), f32).at[1:ni + 1, 1:ni + 1].set(
            state.p.astype(f32))
        t_u = tau[0].astype(f32)[:nc, :nc]
        t_v = tau[1].astype(f32)[:nc, :nc]
        t_p = jnp.zeros((nc, nc), f32).at[1:ni + 1, 1:ni + 1].set(
            tau[2].astype(f32))
        u, v, p, m = call(*mat_list, u, v, p, t_u, t_v, t_p, scal)
        u_full = bord_u.at[:nc, :nc].set(u)
        v_full = bord_v.at[:nc, :nc].set(v)
        metrics = {
            "u_eq": m[0, 0], "v_eq": m[0, 1], "continuity": m[0, 2],
            "energy": m[0, 3], "enstrophy": m[0, 4],
            "palinstrophy": m[0, 5],
        }
        return SpectralState(u=u_full, v=v_full,
                             p=p[1:ni + 1, 1:ni + 1]), metrics

    return step
