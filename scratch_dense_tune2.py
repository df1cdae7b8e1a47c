"""Chained timing: each rep depends on the previous result (no dedup/cache)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
N = 1 << 27
lo, hi = 1, 16_000_000

rng = np.random.default_rng(0)
sk = rng.integers(1, 2 * hi, N).astype(np.int32)
sp = np.arange(N, dtype=np.int32)
rows = N // LANES
sk2 = jnp.asarray(sk.reshape(rows, LANES))
sp2 = jnp.asarray(sp.reshape(rows, LANES))
expect = int(((sk >= lo) & (sk <= hi)).sum())


def timeit_chained(name, fn, reps=10, streams=2):
    # fn(carry) -> new scalar carry; depends on all data
    c = jax.block_until_ready(fn(jnp.int32(0)))
    t0 = time.perf_counter()
    for _ in range(reps):
        c = fn(c)
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / reps
    gbs = streams * N * 4 / dt / 1e9
    print(f"{name}: {dt*1e3:.2f} ms  {gbs:.0f} GB/s")
    return c


@jax.jit
def xla_chain(c):
    hit = (sk2 >= lo + c * 0) & (sk2 <= hi)
    return jnp.sum(hit.astype(jnp.int32)) + c * 0


def make_a(block_rows):
    def kernel(c_ref, k_ref, p_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0] = c_ref[0] * 0
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
    def run(c):
        grid = rows // block_rows
        out = pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [
                pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(c.reshape(1), sk2, sp2)
        return out[0, 0]
    return run


c = timeit_chained("XLA count chained [1 stream]", xla_chain, streams=1)
assert int(c) == expect, int(c)
for br in (512, 1024, 2048, 4096):
    c = timeit_chained(f"A chained block={br} [2 streams]", make_a(br))
    assert int(c) == expect, (br, int(c))
