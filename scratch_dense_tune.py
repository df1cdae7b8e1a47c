"""Scratch: tune dense_count_join toward HBM roofline on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
N = 1 << 27  # 134.2M, rows divisible by 8192
lo, hi = 1, 16_000_000

rng = np.random.default_rng(0)
sk = rng.integers(1, 2 * hi, N).astype(np.int32)
sp = np.arange(N, dtype=np.int32)
rows = N // LANES
sk2 = jnp.asarray(sk.reshape(rows, LANES))
sp2 = jnp.asarray(sp.reshape(rows, LANES))
expect = int(((sk >= lo) & (sk <= hi)).sum())


def timeit(name, fn, *args, reps=20, streams=2):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gbs = streams * N * 4 / dt / 1e9
    print(f"{name}: {dt*1e3:.2f} ms  {gbs:.0f} GB/s")
    return out


# variant A: scalar SMEM acc, full jnp.sum, explicit arbitrary semantics
def make_a(block_rows):
    def kernel(k_ref, p_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0] = 0
            acc_ref[1] = 0
        keys = k_ref[:]
        hit = (keys >= jnp.int32(lo)) & (keys <= jnp.int32(hi))
        acc_ref[0] += jnp.sum(hit.astype(jnp.int32))
        acc_ref[1] += jnp.sum(jnp.where(hit, p_ref[:], 0), dtype=jnp.int32)

        @pl.when(i == n - 1)
        def _():
            out_ref[0, 0] = acc_ref[0]
            out_ref[0, 1] = acc_ref[1]
    @jax.jit
    def run(k2, p2):
        grid = rows // block_rows
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(k2, p2)
    return run


# variant K: keys only (1 stream) — count only
def make_k(block_rows):
    def kernel(k_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0] = 0
        keys = k_ref[:]
        hit = (keys >= jnp.int32(lo)) & (keys <= jnp.int32(hi))
        acc_ref[0] += jnp.sum(hit.astype(jnp.int32))

        @pl.when(i == n - 1)
        def _():
            out_ref[0, 0] = acc_ref[0]
    @jax.jit
    def run(k2):
        grid = rows // block_rows
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(k2)
    return run


@jax.jit
def xla_both(k2, p2):
    hit = (k2 >= lo) & (k2 <= hi)
    return jnp.sum(hit.astype(jnp.int32)), jnp.sum(jnp.where(hit, p2, 0))


@jax.jit
def xla_sum1(k2):
    return jnp.sum(k2)


out = timeit("XLA sum(keys) [1 stream]", xla_sum1, sk2, streams=1)
out = timeit("XLA count+chk [2 streams]", xla_both, sk2, sp2)
assert int(out[0]) == expect
for br in (256, 512, 1024, 2048):
    out = timeit(f"K keys-only block={br} [1 stream]", make_k(br), sk2,
                 streams=1)
    assert int(out[0, 0]) == expect, (br, int(out[0, 0]), expect)
for br in (256, 512, 1024, 2048, 4096):
    out = timeit(f"A block={br} [2 streams]", make_a(br), sk2, sp2)
    assert int(out[0, 0]) == expect, (br, int(out[0, 0]), expect)
