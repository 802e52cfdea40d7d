"""TPU probe: MXU issue cost of padded (160-class) vs 128-aligned dots.

The tiled kernels pad nf=129 -> nfp=160, so every dot pays ceil(dim/128)
tile passes in M/K/N: a (320,160)@(160,160) left dot costs 3*2*2 = 12
passes for ~1 tile of useful work. A bordered decomposition does the core
as (256,128)@(128,128) = 2 passes + rank-1 fixups. This probe times raw
dot chains at both shape classes to bound the achievable speedup.

Usage: python scripts/dev/dot_shapes_probe.py [reps_inner] [timed_calls]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
CALLS = int(sys.argv[2]) if len(sys.argv) > 2 else 30


def sync(x):
    return float(jnp.sum(x))


def make_dot_loop(m, k, n, reps, dtype=jnp.bfloat16):
    """Kernel: reps x [a@b] with a serial perturbation to defeat CSE."""

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        def body(i, _):
            acc_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # feed the result back into a row block of a to serialize
            s = jnp.sum(acc_ref[0:8, 0:128]) * 0.0
            a_ref[0:8, :] = a_ref[0:8, :] + s.astype(a_ref.dtype)
            return 0

        jax.lax.fori_loop(0, reps, body, 0)
        o_ref[:] = acc_ref[:]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        input_output_aliases={},
    )

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.float32).astype(dtype)
    b = jax.random.normal(key, (k, n), jnp.float32).astype(dtype)
    fn = jax.jit(lambda: call(a, b))
    return fn


def bench(tag, m, k, n, useful_flops):
    fn = make_dot_loop(m, k, n, REPS)
    sync(fn())  # compile
    t0 = time.time()
    for _ in range(CALLS):
        out = fn()
    sync(out)
    wall = time.time() - t0
    dots = REPS * CALLS
    per_dot_us = wall / dots * 1e6
    eff = useful_flops * dots / wall / 1e12
    raw = 2 * m * k * n * dots / wall / 1e12
    print(f"{tag:28s} ({m:4d},{k:3d})@({k:3d},{n:3d}): "
          f"{per_dot_us:7.2f} us/dot  raw {raw:6.1f} TF/s  "
          f"useful {eff:6.1f} TF/s")


nf = 129
useful = 2 * (2 * nf) * nf * nf  # stacked left dot useful FLOPs
print(f"device: {jax.devices()[0]}  reps={REPS} calls={CALLS}")
# current padded left dot (one bf16 pass of the x3 triple)
bench("padded-160 left", 320, 160, 160, useful)
# bordered core left dot
bench("aligned-128 left", 256, 128, 128, useful)
# current padded right dot (DY2)
bench("padded-160 right", 160, 160, 320, useful)
# bordered core right dot
bench("aligned-128 right", 128, 128, 256, useful)
# N=256 class
nf2 = 257
useful2 = 2 * (2 * nf2) * nf2 * nf2
bench("padded-288 left (N=256)", 576, 288, 288, useful2)
bench("aligned-256 left (N=256)", 512, 256, 256, useful2)
# lane-batched right at B=8
bench("lanes B=8 padded right", 8 * 160, 160, 320, 8 * useful)
bench("lanes B=8 aligned right", 8 * 128, 128, 256, 8 * useful)
