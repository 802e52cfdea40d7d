"""Lane-batched fused chunk kernel: B sweep lanes in ONE Pallas program.

The vmapped sweep path (parallel/sweep.py) runs the XLA ``sg_step`` per
lane under ``vmap`` — at N=128 each lane's 129^2 operands leave the MXU
mostly idle and every chunk pays a host sync per BATCH of work the XLA
scheduler fragments into thousands of small dots. This module instead makes
the batch axis a *layout* axis inside one fused kernel (the round-2 tier,
ops/pallas_tiled.py, fused whole chunks for B=1):

- lane states ride ROW-STACKED ``(B*nfp, nfp)`` arrays (lane b owns rows
  ``[b*nfp, (b+1)*nfp)``; nfp is a multiple of 8, so every per-lane row
  slice is sublane-aligned — no Mosaic relayouts);
- RIGHT-side products (``u @ DY2`` etc.) contract over columns, so one MXU
  dot serves the whole batch: ``(B*nfp, nfp) @ (nfp, 2nfp)``;
- LEFT-side products (``DX2 @ u_b``) contract over rows and stay per-lane
  (same dot shapes as the B=1 kernel — per-lane arithmetic is
  BIT-IDENTICAL to ops/pallas_tiled.make_tiled_chunk_runner);
- the per-lane convergence state machine (rel-iter criterion, warmup gate,
  NaN freeze) runs on per-lane scalars exactly as the B=1 chunk kernel,
  so a converged/diverged lane freezes without disturbing its neighbours;
- ONE kernel launch advances every lane ``chunk`` steps: the per-chunk
  host sync (the ~100 ms remote-tunnel cost that bounds small-N rates) is
  amortized B ways.

Reference semantics: the per-lane solver is src/solvers/spectral/sg.py
(residuals :278-346, CFL dt :387-408, RK4 :410-449); the lane isolation
contract is the reference's divergence handling (multigrid/fsg.py:1184-1190).

The kernel is float32 (the TPU-native production dtype) and supports the
``rel_iter`` criterion — the one parallel/sweep.run_batched_sweep
implements. Mosaic constraint honored throughout: no scatter-style
``.at[].set`` on traced values inside the kernel — per-lane bookkeeping
rides tuples of scalars through the ``fori_loop`` carry, and the metric
row is assembled with stack/concatenate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.spectral_sg import SpectralOps, SpectralState
from .pallas_tiled import (_DotEngine, _pad_ops, _RK4_ALPHAS, N_COLS,
                           MAX_TILED_N)

__all__ = ["make_lane_chunk_runner", "suggest_lane_count", "MAX_LANE_N",
           "maybe_lane_runner"]

MAX_LANE_N = MAX_TILED_N

# VMEM budget for auto lane-count selection: per-lane resident arrays are
# u/v/p out (aliased inputs), u/v/p stage scratch = 6 nfp x nfp f32 units,
# plus the right-product values and bf16 split temporaries the compiler
# materializes per stage (~4.5 units).
_VMEM_BUDGET_BYTES = 11 * 2**20
_UNITS_PER_LANE = 10.5


def suggest_lane_count(n: int, requested: int) -> int:
    """Largest B <= requested whose working set fits the VMEM budget."""
    nf = n + 1
    nfp = -(-nf // 32) * 32
    unit = nfp * nfp * 4
    fit = max(1, int(_VMEM_BUDGET_BYTES / (_UNITS_PER_LANE * unit)))
    return max(1, min(int(requested), fit))


def maybe_lane_runner(ops_list, params, mesh=None, log=None):
    """Factory ``(chunk, tol, warmup) -> chunk_fn`` when the lane kernel
    covers this batch, else None (callers fall back to the vmapped XLA
    path). Covers: single device (no mesh), TPU float32 with
    ``use_pallas`` not disabled, N within the kernel/VMEM budget, shared
    operators and the cavity BC structure across lanes.
    """
    import jax as _jax

    flag = str(getattr(params, "use_pallas", "auto")).lower()
    if mesh is not None or flag in ("false", "0", "no"):
        return None
    if flag not in ("true", "1", "yes") and (
            _jax.default_backend() != "tpu"
            or jnp.dtype(params.dtype) != jnp.float32):
        return None
    n = int(np.asarray(ops_list[0].bc_u).shape[0]) - 1
    B = len(ops_list)
    # Prefer the lane-batched BORDERED-CORE kernel (round 4): the padded
    # tiled engine pays the ceil(+1) MXU tax per lane (59k aggregate at
    # N=128 B=8 vs 182k for ONE serial aligned solve, BENCH_r03); the
    # aligned lane kernel removes it per lane. metrics_every=16 matches the
    # production single-solve aligned tier (models/spectral.py
    # ALIGNED_METRICS_EVERY; 16-vs-8 measured +2.1% at N=96 B=32).
    from .pallas_lanes_aligned import (aligned_lanes_supported,
                                       make_aligned_lane_runner)

    if aligned_lanes_supported(ops_list):
        if log is not None:
            log.info("Lane-batched ALIGNED kernel: %d lanes of N=%d "
                     "(bordered cores) in one Pallas program", B, n)
        return lambda chunk, tol, warmup: make_aligned_lane_runner(
            ops_list, chunk, tol, warmup, metrics_every=16)
    if n > MAX_LANE_N:
        return None
    fit = suggest_lane_count(n, B)
    if fit < B:
        if log is not None:
            log.info("%d lanes exceed the lane kernel's VMEM budget "
                     "(%d fit at N=%d); using the vmapped XLA path", B, fit, n)
        return None
    try:
        _validate_lanes(ops_list)
    except ValueError as exc:
        if log is not None:
            log.info("Lane-batched kernel unavailable (%s); using the "
                     "vmapped XLA path", exc)
        return None
    if log is not None:
        log.info("Lane-batched fused kernel: %d lanes of N=%d in one "
                 "Pallas program", B, n)
    return lambda chunk, tol, warmup: make_lane_chunk_runner(
        ops_list, chunk, tol, warmup)


def _validate_lanes(ops_list) -> None:
    """Lanes must share every operator matrix (same N/basis/domain); only
    scalars and the lid profile may vary (main._BATCHABLE_VARYING)."""
    o0 = ops_list[0]
    for k, o in enumerate(ops_list[1:], 1):
        for name in ("Dx", "DyT", "Dxx", "DyyT", "Ix", "IyT", "Gx", "GyT",
                     "interior", "W2d"):
            if not np.array_equal(np.asarray(getattr(o0, name)),
                                  np.asarray(getattr(o, name))):
                raise ValueError(
                    f"lane {k} operator {name!r} differs from lane 0: "
                    "lane-batched kernels need shared operators")
        bc_u = np.asarray(o.bc_u)
        if np.any(np.asarray(o.bc_v)) or np.any(bc_u[:, :-1]):
            raise ValueError(
                "lane-batched kernel assumes the cavity BC structure "
                "(bc_v == 0, bc_u nonzero only on the lid column)")


def make_lane_chunk_runner(ops_list, chunk: int, tolerance: float,
                           warmup: int, interpret: bool = False,
                           algorithm: str = "x3", metrics_every: int = 1):
    """Build the fused B-lane chunk function.

    Returns ``chunk_fn(states, start_iter) -> (states, done, conv_iter,
    ever_conv, rows)`` with batched ``states`` (leading axis B), per-lane
    ``done/conv_iter/ever_conv`` of shape (B,), and ``rows`` of shape
    (chunk, B, N_COLS) in runner.METRIC_KEYS order — the
    parallel/sweep.make_batched_chunk_runner contract (minus the ops
    argument, which is baked in).
    """
    B = len(ops_list)
    if B < 1:
        raise ValueError("need at least one lane")
    _validate_lanes(ops_list)
    ops0: SpectralOps = ops_list[0]
    mats, _scal0, nf, ni, nfp = _pad_ops(ops0, None, algorithm)
    if nf - 1 > MAX_LANE_N:
        raise ValueError(
            f"lane kernel supports N <= {MAX_LANE_N} (got N={nf - 1})")
    metrics_every = max(1, int(metrics_every))
    chunk = int(chunk)
    f32 = jnp.float32
    mat_names = list(mats)
    n_mats = len(mat_names)
    BN = B * nfp

    # per-lane scalars: nu, beta_sq, CFL, lid_velocity, inv_dx, inv_dy
    scal = jnp.stack([
        jnp.stack([o.nu, o.beta_sq, o.CFL, o.lid_velocity,
                   o.inv_dx_min, o.inv_dy_min]).astype(f32)
        for o in ops_list
    ])  # (B, 6)
    # per-lane lid profile as a column vector; bc_u_b = lid_col * onehot
    lid = np.zeros((BN, 1), np.float32)
    for b, o in enumerate(ops_list):
        lid[b * nfp: b * nfp + nf, 0] = np.asarray(o.bc_u)[:, nf - 1]
    lid = jnp.asarray(lid)
    onehot = np.zeros((1, nfp), np.float32)
    onehot[0, nf - 1] = 1.0
    onehot = jnp.asarray(onehot)
    interior = jnp.asarray(
        np.pad(np.asarray(ops0.interior, np.float32),
               ((0, nfp - nf), (0, nfp - nf))))
    W2d = jnp.asarray(
        np.pad(np.asarray(ops0.W2d, np.float32),
               ((0, nfp - nf), (0, nfp - nf))))

    # one row of per-lane metric octets, padded to the 128-lane tile
    RW = max(128, -(-8 * B // 128) * 128)

    def kernel(*args):
        op_refs = dict(zip(mat_names, args[:n_mats]))
        (lid_ref, onehot_ref, interior_ref, W2d_ref,
         u_in, v_in, p_in, scal_ref, iscal_ref,
         u_out, v_out, p_out, rows_out, state_out,
         su, sv, sp) = args[n_mats:]

        start_iter = iscal_ref[0, 0]
        eng = _DotEngine(algorithm, op_refs)
        intr = interior_ref[:]
        w2d = W2d_ref[:]
        oh = onehot_ref[:]

        # in/out are aliased, so u_out already holds the input state.

        def lane_rows(b):
            return slice(b * nfp, (b + 1) * nfp)

        def loop_body(i, carry):
            done_t, conv_t, e_t, z_t, pl_t = carry
            idx = start_iter + i

            su[:] = u_out[:]
            sv[:] = v_out[:]
            sp[:] = p_out[:]

            # per-lane prev norms + CFL dt (identical math to the B=1
            # kernel's _adaptive_dt, using each lane's scalars)
            prev_u, prev_v, adt = [], [], []
            for b in range(B):
                r = lane_rows(b)
                ub = su[r, :]
                vb = sv[r, :]
                prev_u.append(jnp.sqrt(jnp.sum(ub * ub)))
                prev_v.append(jnp.sqrt(jnp.sum(vb * vb)))
                nu_b = scal_ref[b, 0]
                beta_b = scal_ref[b, 1]
                cfl_b = scal_ref[b, 2]
                lid_b = scal_ref[b, 3]
                inv_dx = scal_ref[b, 4]
                inv_dy = scal_ref[b, 5]
                u_max = jnp.maximum(jnp.max(jnp.abs(ub)), lid_b)
                v_max = jnp.maximum(jnp.max(jnp.abs(vb)), 1e-10)
                lam_x = (u_max + jnp.sqrt(u_max * u_max + beta_b)) * inv_dx \
                    + nu_b * inv_dx * inv_dx
                lam_y = (v_max + jnp.sqrt(v_max * v_max + beta_b)) * inv_dy \
                    + nu_b * inv_dy * inv_dy
                adt.append(cfl_b / (lam_x + lam_y))

            acc = [(jnp.float32(0),) * 3 for _ in range(B)]
            for k, alpha in enumerate(_RK4_ALPHAS):
                last = k == len(_RK4_ALPHAS) - 1
                u_c = eng.cache(su[:])
                v_c = eng.cache(sv[:])
                p_c = eng.cache(sp[:])
                # batched rights: one dot covers every lane
                RU = eng.right(u_c, "DY2")   # (BN, 2nfp) value
                RV = eng.right(v_c, "DY2")
                for b in range(B):
                    r = lane_rows(b)
                    u_b = su[r, :]
                    v_b = sv[r, :]
                    LU, LV = eng.left2("DX2", u_c, v_c, rows=r)  # merged
                    LP = eng.left_hl("PX2", p_c, rows=r)  # [Gx@p; Ix@p]
                    dpx = eng.right_hl(eng.cache(LP[0:nfp, :]), "IyT")
                    dpy = eng.right_hl(eng.cache(LP[nfp:2 * nfp, :]), "GyT")
                    du_dx = LU[0:nfp, :]
                    dv_dx = LV[0:nfp, :]
                    du_dy = RU[r, 0:nfp]
                    dv_dy = RV[r, 0:nfp]
                    lap_u = LU[nfp:2 * nfp, :] + RU[r, nfp:2 * nfp]
                    lap_v = LV[nfp:2 * nfp, :] + RV[r, nfp:2 * nfp]
                    nu_b = scal_ref[b, 0]
                    beta_b = scal_ref[b, 1]
                    R_u = -(u_b * du_dx + v_b * du_dy) - dpx + nu_b * lap_u
                    R_v = -(u_b * dv_dx + v_b * dv_dy) - dpy + nu_b * lap_v
                    R_p = -beta_b * (du_dx + dv_dy) * intr
                    bc_b = lid_ref[r, :] * oh
                    a = adt[b] * alpha
                    su[r, :] = jnp.where(intr > 0.5,
                                         u_out[r, :] + a * R_u, bc_b)
                    sv[r, :] = jnp.where(intr > 0.5,
                                         v_out[r, :] + a * R_v,
                                         jnp.float32(0.0))
                    sp[r, :] = p_out[r, :] + a * R_p
                    if last:
                        acc[b] = (jnp.sum(R_u * R_u), jnp.sum(R_v * R_v),
                                  jnp.sum(R_p * R_p))

            # conserved quantities (same op order as the B=1 metrics pass);
            # intermediates stay SSA values — Mosaic places them in VMEM
            def metrics_pass():
                u_c2 = eng.cache(su[:])
                v_c2 = eng.cache(sv[:])
                DUY = eng.right(u_c2, "DyT")   # du/dy of the post state
                OM = jnp.concatenate(
                    [eng.left("Dx", v_c2, rows=lane_rows(b))
                     - DUY[lane_rows(b), :] for b in range(B)], axis=0)
                om_c = eng.cache(OM)
                DWY = eng.right(om_c, "DyT")
                es, zs, ps = [], [], []
                for b in range(B):
                    r = lane_rows(b)
                    u_b = su[r, :]
                    v_b = sv[r, :]
                    om = OM[r, :]
                    dwx = eng.left("Dx", om_c, rows=r)
                    dwy = DWY[r, :]
                    es.append(0.5 * jnp.sum(w2d * (u_b * u_b + v_b * v_b)))
                    zs.append(0.5 * jnp.sum(w2d * om * om))
                    ps.append(0.5 * jnp.sum(w2d * (dwx * dwx + dwy * dwy)))
                return tuple(es), tuple(zs), tuple(ps)

            if metrics_every == 1:
                e_t, z_t, pl_t = metrics_pass()
            else:
                e_t, z_t, pl_t = jax.lax.cond(
                    idx % jnp.int32(metrics_every) == 0, metrics_pass,
                    lambda: (e_t, z_t, pl_t))

            nan = jnp.float32(jnp.nan)
            lane_octets = []
            new_done, new_conv = [], []
            for b in range(B):
                r = lane_rows(b)
                done_b = done_t[b] > 0
                du = jnp.sqrt(jnp.sum((su[r, :] - u_out[r, :]) ** 2))
                dv = jnp.sqrt(jnp.sum((sv[r, :] - v_out[r, :]) ** 2))
                rel = jnp.maximum(du / (prev_u[b] + 1e-12),
                                  dv / (prev_v[b] + 1e-12))
                vals = (rel, jnp.sqrt(acc[b][0]), jnp.sqrt(acc[b][1]),
                        jnp.sqrt(acc[b][2]), e_t[b], z_t[b], pl_t[b],
                        jnp.float32(0.0))
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
            return (tuple(new_done), tuple(new_conv), e_t, z_t, pl_t)

        zero_t = tuple(jnp.float32(0) for _ in range(B))
        init = (tuple(jnp.int32(0) for _ in range(B)),
                tuple(jnp.int32(-1) for _ in range(B)),
                zero_t, zero_t, zero_t)
        done_t, conv_t, _e, _z, _p = jax.lax.fori_loop(
            0, chunk, loop_body, init)
        for b in range(B):
            state_out[0, b] = done_t[b]
            state_out[0, B + b] = conv_t[b]

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((BN, nfp), f32),
            jax.ShapeDtypeStruct((BN, nfp), f32),
            jax.ShapeDtypeStruct((BN, nfp), f32),
            jax.ShapeDtypeStruct((chunk, RW), f32),
            jax.ShapeDtypeStruct((1, 2 * B), jnp.int32),
        ),
        in_specs=[vmem() for _ in range(n_mats + 4 + 3)]
        + [pl.BlockSpec((B, 6), memory_space=pltpu.SMEM),
           pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(vmem(), vmem(), vmem(), vmem(),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((BN, nfp), f32) for _ in range(3)],
        input_output_aliases={n_mats + 4: 0, n_mats + 5: 1, n_mats + 6: 2},
        interpret=interpret,
    )
    mat_list = [mats[k] for k in mat_names]

    @jax.jit
    def chunk_fn(states: SpectralState, start_iter):
        # (B, nf, nf) -> row-stacked (B*nfp, nfp)
        def embed(x, n0):
            pad = jnp.zeros((B, nfp, nfp), f32)
            pad = pad.at[:, :n0, :n0].set(x.astype(f32))
            return pad.reshape(BN, nfp)

        U = embed(states.u, nf)
        V = embed(states.v, nf)
        P = jnp.zeros((B, nfp, nfp), f32).at[:, 1:ni + 1, 1:ni + 1].set(
            states.p.astype(f32)).reshape(BN, nfp)
        iscal = jnp.asarray(start_iter, jnp.int32).reshape(1, 1)
        U, V, P, rows, flags = call(*mat_list, lid, onehot, interior, W2d,
                                    U, V, P, scal, iscal)
        new_states = SpectralState(
            u=U.reshape(B, nfp, nfp)[:, :nf, :nf],
            v=V.reshape(B, nfp, nfp)[:, :nf, :nf],
            p=P.reshape(B, nfp, nfp)[:, 1:ni + 1, 1:ni + 1])
        done = flags[0, :B] > 0
        conv_iter = flags[0, B:]
        # runner-layout rows: (chunk, B, N_COLS)
        rows_b = jnp.stack(
            [rows[:, b * 8: b * 8 + N_COLS] for b in range(B)], axis=1)
        conv_row = jnp.maximum(conv_iter - 1 - start_iter, 0)
        ever_conv = done & jnp.isfinite(
            rows_b[conv_row, jnp.arange(B), 0])
        return new_states, done, conv_iter, ever_conv, rows_b

    return chunk_fn
