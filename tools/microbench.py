"""Primitive microbenchmarks on the real chip.

Measures the building blocks that decide the join engine architecture:
HBM stream copy, XLA gather/scatter, XLA sort, and the Pallas partition
pass — so geometry choices are driven by measured numbers, not guesses.

The axon runtime is lazy: block_until_ready does not force execution, so
every timed fn returns a SCALAR computed from its full output and the
timer spans dispatch -> int() readback.  A varying int32 `chain` input
defeats the runtime's dispatch cache.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(name, fn, *args, reps=5, bytes_moved=None, elems=None):
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    int(fn(*args, jnp.int32(0)))
    compile_s = time.perf_counter() - t0
    best = None
    for i in range(reps):
        t0 = time.perf_counter()
        int(fn(*args, jnp.int32(i + 1)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    extra = ""
    if bytes_moved:
        extra += f" {bytes_moved/best/1e9:.1f} GB/s"
    if elems:
        extra += f" {elems/best/1e9:.2f} G elem/s"
    print(f"{name:34s} {best*1e3:9.3f} ms{extra}  (first {compile_s:.1f}s)",
          flush=True)
    return best


def scalarize(y):
    """Cheap scalar data-dependent on the whole array without a full reduce."""
    import jax.numpy as jnp
    return y.ravel()[0] + y.ravel()[-1] + y.ravel()[y.size // 2]


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    N = 128_000_000
    NR = 16_000_000

    sk = jnp.asarray(rng.integers(1, NR + 1, N).astype(np.int32))
    rk = jnp.asarray(rng.permutation(np.arange(1, NR + 1)).astype(np.int32))

    # 0. dispatch floor: trivial scalar program
    timeit("dispatch floor", jax.jit(lambda c: c + 1), elems=None)

    # 1. HBM stream: copy 512MB (read+write = 1GB moved)
    timeit("stream copy 128M i32",
           jax.jit(lambda x, c: scalarize(x + c)), sk,
           bytes_moved=2 * 4 * N, elems=N)

    # 2. sum (read only)
    timeit("reduce sum 128M i32",
           jax.jit(lambda x, c: jnp.sum(x + c)), sk,
           bytes_moved=4 * N, elems=N)

    # 3. XLA gather: 128M lookups from a 64MB table
    tbl = jnp.asarray(rng.integers(0, 100, NR + 2).astype(np.int32))
    timeit("gather 128M from 16M tbl",
           jax.jit(lambda t, i, c: jnp.sum(t[i] + c)), tbl, sk,
           elems=N)

    # 3b. gather from a small (128K) table
    ski = jnp.asarray(rng.integers(0, 131072, N).astype(np.int32))
    tbl2 = jnp.asarray(rng.integers(0, 100, 131072).astype(np.int32))
    timeit("gather 128M from 128K tbl",
           jax.jit(lambda t, i, c: jnp.sum(t[i] + c)), tbl2, ski,
           elems=N)

    # 4. XLA scatter-add: 16M adds into a 16M-slot table
    timeit("scatter-add 16M into 16M",
           jax.jit(lambda k, c: scalarize(jnp.zeros(NR + 2, jnp.int32)
                                          .at[k].add(1) + c)), rk, elems=NR)

    # 4b. scatter-add 128M into 16M
    timeit("scatter-add 128M into 16M",
           jax.jit(lambda k, c: scalarize(jnp.zeros(NR + 2, jnp.int32)
                                          .at[k].add(1) + c)), sk, elems=N)

    # 5. XLA sort 16M / 128M int32
    rk_small = rk[:NR]
    timeit("sort 16M i32",
           jax.jit(lambda x, c: scalarize(jnp.sort(x) + c)),
           rk_small, elems=NR, reps=3)
    timeit("sort 128M i32",
           jax.jit(lambda x, c: scalarize(jnp.sort(x) + c)),
           sk, elems=N, reps=2)

    # 5b. sort pairs (key+payload) 128M
    timeit("sort2 128M kv",
           jax.jit(lambda k, v, c: scalarize(
               jax.lax.sort((k, v), num_keys=1)[0] + c)),
           sk, sk, elems=N, reps=2)

    # 6. Pallas partition pass at bench geometry
    from hwbloomradixjoin_tpu.ops import bitmap_join, radix as radix_ops
    part_bits, shift, sl_rows = bitmap_join.plan_geometry(1, NR)
    geom = radix_ops.RadixGeom(chunk_rows=radix_ops.CHUNK_ROWS,
                               part_bits=part_bits, lo=1, hi=NR, shift=shift)
    print(f"geom: part_bits={part_bits} shift={shift} sl_rows={sl_rows}",
          flush=True)
    chunk = radix_ops.CHUNK_ROWS * 128
    sk16_pad = radix_ops._chunk_pad(sk[:16_000_000], chunk)

    CH = 8  # chained passes inside one program to amortize dispatch floor

    def chained_part(x, c):
        def body(i, acc):
            y, _ = radix_ops.partition_pass(acc, geom=geom)
            return y.reshape(-1)
        y = jax.lax.fori_loop(0, CH, body, x + c * 0)
        return scalarize(y)

    dt = timeit("partition_pass 16M x8", jax.jit(chained_part), sk16_pad,
                reps=2)
    print(f"  -> per pass: {dt/CH*1e3:.2f} ms = "
          f"{16e6/(dt/CH)/1e9:.2f} G elem/s", flush=True)


if __name__ == "__main__":
    main()
