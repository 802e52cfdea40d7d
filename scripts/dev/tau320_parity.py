"""Parity probe: the row-blocked N=320 FAS-forced (with_tau) kernel vs the
XLA sg_step, on real TPU.

Both the [320,160,80] NaN and the [320,160] L2=0.30 VMG runs share one new
component: the fine-level N=320 fused tau kernel in the raised-VMEM tier
(blk=32).  This checks it directly: a few steps from a smooth state, zero
tau and nonzero tau, compared to core.sg_step.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from anap3_tpu.models import spectral_sg as core
from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.ops.pallas_tiled import make_tiled_sg_step

N = int(sys.argv[1]) if len(sys.argv) > 1 else 320
BLK = int(sys.argv[2]) if len(sys.argv) > 2 else 32
params = SpectralParameters(Re=1000.0, nx=N, ny=N, dtype="float32")
ops, _ = core.build_spectral_ops(params, n=N)
state = core.initial_state(ops)

# smooth nonzero start so convection terms are exercised (coordinates only
# parameterize smooth test fields; exact node positions don't matter)
x = jnp.linspace(0.0, 1.0, N + 1)
X, Y = jnp.meshgrid(x, x, indexing="ij")
u = state.u + 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.sin(jnp.pi * Y) ** 2
v = state.v - 0.3 * jnp.sin(jnp.pi * X) ** 2 * jnp.sin(2 * jnp.pi * Y)
u, v = core.enforce_bc(ops, u, v)
state = core.SpectralState(u=u, v=v, p=state.p)

zero_tau = (jnp.zeros_like(state.u), jnp.zeros_like(state.v),
            jnp.zeros_like(state.p))
xi = x[1:-1]
XI, YI = jnp.meshgrid(xi, xi, indexing="ij")
real_tau = (1e-3 * jnp.sin(3 * jnp.pi * X) * Y,
            -1e-3 * jnp.cos(2 * jnp.pi * Y) * X,
            1e-3 * jnp.sin(jnp.pi * XI) * jnp.sin(jnp.pi * YI))

fused = make_tiled_sg_step(ops, algorithm="x6", with_tau=True, blk=BLK)
fused_unblk = make_tiled_sg_step(ops, algorithm="x6", with_tau=True, blk=None) \
    if N <= 256 else None


def run(step, s, tau, n):
    for _ in range(n):
        s, m = step(s, tau)
    return s, m


@jax.jit
def xla_run(s, tau, n=3):
    def body(s, _):
        return core.sg_step(ops, s, tau=tau)
    s, ms = jax.lax.scan(body, s, None, length=n)
    return s, jax.tree.map(lambda a: a[-1], ms)


for name, tau in [("zero-tau", zero_tau), ("real-tau", real_tau)]:
    sx, mx = xla_run(state, tau)
    sf, mf = run(jax.jit(fused), state, tau, 3)
    du = float(jnp.max(jnp.abs(sx.u - sf.u)))
    dv = float(jnp.max(jnp.abs(sx.v - sf.v)))
    dp = float(jnp.max(jnp.abs(sx.p - sf.p)))
    print(f"[{name}] blk={BLK}: max|du|={du:.3e} |dv|={dv:.3e} |dp|={dp:.3e}",
          flush=True)
    print(f"  metrics xla={jax.tree.map(float, mx)}", flush=True)
    print(f"  metrics fused={jax.tree.map(float, mf)}", flush=True)
    if fused_unblk is not None:
        su, _ = run(jax.jit(fused_unblk), state, tau, 3)
        print(f"  blocked-vs-unblocked max|du|="
              f"{float(jnp.max(jnp.abs(su.u - sf.u))):.3e}", flush=True)
