"""Multi-step Pallas chunk kernel: K RK4 timesteps per kernel launch.

One level beyond ops/pallas_step.py: the scan over steps moves INSIDE the
kernel (a ``fori_loop`` whose carry lives in VMEM/registers), removing the
remaining per-step launch and XLA-glue overhead. The kernel also carries the
convergence state machine of models/runner.py — per-step relative iterate
change, the warmup gate, done-freezing, divergence detection — and emits the
per-step metric rows, so a chunk call is semantically identical to the
chunked-scan runner (reference-exact early-exit behavior).

Used by make_pallas_chunk_runner, a drop-in for runner.make_chunk_runner on
TPU float32 single-grid solves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.spectral_sg import SpectralOps, SpectralState
from ..models.runner import METRIC_KEYS
from .pallas_step import MAX_FUSED_N

__all__ = ["make_pallas_chunk_runner"]

_RK4_ALPHAS = (0.25, 1.0 / 3.0, 0.5, 1.0)
N_COLS = 7  # rel_iter + 6 step metrics (METRIC_KEYS order)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _make_kernel(chunk: int, tolerance: float, warmup: int):
    def kernel(u_ref, v_ref, p_ref,
               Dx_ref, DyT_ref, Dxx_ref, DyyT_ref,
               Ix_ref, IyT_ref, Gx_ref, GyT_ref,
               bc_u_ref, bc_v_ref, interior_ref, W2d_ref,
               scal_ref, iscal_ref,
               u_out, v_out, p_out, rows_out, state_out):
        nu = scal_ref[0, 0]
        beta_sq = scal_ref[0, 1]
        cfl = scal_ref[0, 2]
        lid = scal_ref[0, 3]
        inv_dx = scal_ref[0, 4]
        inv_dy = scal_ref[0, 5]
        start_iter = iscal_ref[0, 0]

        Dx = Dx_ref[:]
        DyT = DyT_ref[:]
        Dxx = Dxx_ref[:]
        DyyT = DyyT_ref[:]
        Ix = Ix_ref[:]
        IyT = IyT_ref[:]
        Gx = Gx_ref[:]
        GyT = GyT_ref[:]
        interior = interior_ref[:]
        bc_u = bc_u_ref[:]
        bc_v = bc_v_ref[:]
        W2d = W2d_ref[:]

        def residuals(u, v, p_full):
            du_dx = _dot(Dx, u)
            du_dy = _dot(u, DyT)
            dv_dx = _dot(Dx, v)
            dv_dy = _dot(v, DyT)
            lap_u = _dot(Dxx, u) + _dot(u, DyyT)
            lap_v = _dot(Dxx, v) + _dot(v, DyyT)
            p = p_full[1:-1, 1:-1]
            dp_dx = _dot(_dot(Gx, p), IyT)
            dp_dy = _dot(_dot(Ix, p), GyT)
            R_u = -(u * du_dx + v * du_dy) - dp_dx + nu * lap_u
            R_v = -(u * dv_dx + v * dv_dy) - dp_dy + nu * lap_v
            R_p = -beta_sq * (du_dx + dv_dy) * interior
            return R_u, R_v, R_p

        def one_step(u0, v0, p0_full):
            u_max = jnp.maximum(jnp.max(jnp.abs(u0)), lid)
            v_max = jnp.maximum(jnp.max(jnp.abs(v0)), 1e-10)
            lam_x = (u_max + jnp.sqrt(u_max * u_max + beta_sq)) * inv_dx \
                + nu * inv_dx * inv_dx
            lam_y = (v_max + jnp.sqrt(v_max * v_max + beta_sq)) * inv_dy \
                + nu * inv_dy * inv_dy
            dt = cfl / (lam_x + lam_y)
            u, v, p_full = u0, v0, p0_full
            R_u = R_v = R_p = None
            for alpha in _RK4_ALPHAS:
                R_u, R_v, R_p = residuals(u, v, p_full)
                u = u0 + (alpha * dt) * R_u
                v = v0 + (alpha * dt) * R_v
                p_full = p0_full + (alpha * dt) * R_p
                u = jnp.where(interior > 0.5, u, bc_u)
                v = jnp.where(interior > 0.5, v, bc_v)
            return u, v, p_full, R_u, R_v, R_p

        def loop_body(i, carry):
            u, v, p_full, done_i, conv_iter = carry
            done = done_i > 0
            idx = start_iter + i

            u_n, v_n, p_n, R_u, R_v, R_p = one_step(u, v, p_full)

            nrm = lambda a: jnp.sqrt(jnp.sum(a * a))
            rel = jnp.maximum(nrm(u_n - u) / (nrm(u) + 1e-12),
                              nrm(v_n - v) / (nrm(v) + 1e-12))
            omega = _dot(Dx, v_n) - _dot(u_n, DyT)
            dwx = _dot(Dx, omega)
            dwy = _dot(omega, DyT)
            nan = jnp.float32(jnp.nan)
            frozen = done
            row = jnp.stack([
                jnp.where(frozen, nan, rel),
                jnp.where(frozen, nan, nrm(R_u)),
                jnp.where(frozen, nan, nrm(R_v)),
                jnp.where(frozen, nan, nrm(R_p)),
                jnp.where(frozen, nan,
                          0.5 * jnp.sum(W2d * (u_n * u_n + v_n * v_n))),
                jnp.where(frozen, nan, 0.5 * jnp.sum(W2d * omega * omega)),
                jnp.where(frozen, nan,
                          0.5 * jnp.sum(W2d * (dwx * dwx + dwy * dwy))),
            ]).reshape(1, N_COLS)
            rows_out[pl.ds(i, 1), :] = row

            finite = jnp.isfinite(rel)
            newly_conv = (idx >= warmup) & (rel < tolerance) & finite
            newly_div = ~finite & ~done
            now_done = done | newly_conv | newly_div
            conv_iter = jnp.where(~done & now_done, idx + 1, conv_iter)

            keep = lambda new, old: jnp.where(done, old, new)
            return (keep(u_n, u), keep(v_n, v), keep(p_n, p_full),
                    now_done.astype(jnp.int32), conv_iter)

        u0 = u_ref[:]
        v0 = v_ref[:]
        p0 = p_ref[:]
        init = (u0, v0, p0, jnp.int32(0), jnp.int32(-1))
        u, v, p_full, done_i, conv_iter = jax.lax.fori_loop(
            0, chunk, loop_body, init)
        u_out[:] = u
        v_out[:] = v
        p_out[:] = p_full
        state_out[0, 0] = done_i
        state_out[0, 1] = conv_iter

    return kernel


def make_pallas_chunk_runner(ops: SpectralOps, chunk: int, tolerance: float,
                             warmup: int, interpret: bool = False):
    """Drop-in for runner.make_chunk_runner backed by ONE kernel per chunk.

    Returns ``chunk_fn(state, start_iter, ref_norm) -> (state, done,
    conv_iter, converged, rows, ref_norm)`` with the same semantics as the
    chunked-scan runner in rel_iter mode.
    """
    nf = ops.bc_u.shape[0]
    if nf - 1 > MAX_FUSED_N:
        raise ValueError(f"in-kernel chunk supports N <= {MAX_FUSED_N}")
    f32 = jnp.float32

    mats = [ops.Dx, ops.DyT, ops.Dxx, ops.DyyT, ops.Ix, ops.IyT, ops.Gx,
            ops.GyT, ops.bc_u, ops.bc_v, ops.interior, ops.W2d]
    mats = [m.astype(f32) for m in mats]
    scal = jnp.stack([ops.nu, ops.beta_sq, ops.CFL, ops.lid_velocity,
                      ops.inv_dx_min, ops.inv_dy_min]).astype(f32).reshape(1, 6)

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = _make_kernel(int(chunk), float(tolerance), int(warmup))
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nf, nf), f32),
            jax.ShapeDtypeStruct((nf, nf), f32),
            jax.ShapeDtypeStruct((nf, nf), f32),
            jax.ShapeDtypeStruct((chunk, N_COLS), f32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ),
        in_specs=[vmem() for _ in range(15)]
        + [pl.BlockSpec((1, 6), memory_space=pltpu.SMEM),
           pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(vmem(), vmem(), vmem(), vmem(),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )

    @jax.jit
    def chunk_fn(state: SpectralState, start_iter, ref_norm):
        p_pad = jnp.pad(state.p.astype(f32), 1)
        iscal = jnp.asarray(start_iter, jnp.int32).reshape(1, 1)
        u, v, p_full, rows, flags = call(
            state.u.astype(f32), state.v.astype(f32), p_pad, *mats, scal,
            iscal)
        new_state = SpectralState(u=u, v=v, p=p_full[1:-1, 1:-1])
        done = flags[0, 0] > 0
        conv_iter = flags[0, 1]
        # a lane counts as converged iff it stopped with a finite rel history
        converged = done & jnp.isfinite(
            rows[jnp.maximum(conv_iter - 1 - start_iter, 0), 0])
        return new_state, done, conv_iter, converged, rows, ref_norm

    return chunk_fn
