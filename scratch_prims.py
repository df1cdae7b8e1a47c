"""Measure candidate join primitives on real TPU at production geometry."""
import time

import numpy as np


def timeit(name, fn, *args, reps=3):
    import jax
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from hwbloomradixjoin_tpu.ops import xla_join

    r_size, s_size = 16_000_000, 128_000_000
    rng = np.random.default_rng(0)
    rk = jnp.asarray(rng.permutation(np.arange(1, r_size + 1)).astype(np.int32))
    sk = jnp.asarray(rng.integers(1, r_size + 1, s_size).astype(np.int32))
    rp = jnp.arange(r_size, dtype=jnp.int32)
    sp = jnp.arange(s_size, dtype=jnp.int32)
    print("data ready", flush=True)

    # 1. raw sort of S keys
    timeit("lax.sort 128M i32", jax.jit(jax.lax.sort), sk)

    # 2. full sort-scan join (portable tier)
    cnt, _, _ = timeit("sort_scan_count 16M x 128M",
                       jax.jit(xla_join.sort_scan_count), rk, rp, sk, sp)
    print("  count =", int(cnt), flush=True)

    # 3. bitmap membership probe: build exact bitmap over key range, gather
    nbits = 1 << 25  # covers keys < 32M

    @jax.jit
    def bitmap_count(rk, sk):
        word = (rk >> 5).astype(jnp.int32)
        bit = (rk & 31).astype(jnp.uint32)
        bm = jax.ops.segment_sum(
            (jnp.uint32(1) << bit).astype(jnp.uint32), word,
            num_segments=nbits // 32, indices_are_sorted=False)
        # note: duplicate R keys would double-count bits; R unique here
        w = bm[(sk >> 5).astype(jnp.int32)]
        hit = ((w >> (sk & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)
        return jnp.sum(hit)

    cnt = timeit("bitmap build+probe", bitmap_count, rk, sk)
    print("  count =", int(cnt), flush=True)

    # 4. gather only: 128M gathers from 4MB table
    tbl = jnp.arange(nbits // 32, dtype=jnp.int32)

    @jax.jit
    def gonly(sk):
        return jnp.sum(tbl[(sk >> 5).astype(jnp.int32)])
    timeit("gather 128M from 4MB", gonly, sk)

    # 5. searchsorted into sorted R
    rks = jax.jit(jax.lax.sort)(rk)

    @jax.jit
    def ss_count(rks, sk):
        i = jnp.searchsorted(rks, sk)
        i = jnp.minimum(i, r_size - 1)
        return jnp.sum((rks[i] == sk).astype(jnp.int32))
    cnt = timeit("searchsorted probe", ss_count, rks, sk)
    print("  count =", int(cnt), flush=True)


if __name__ == "__main__":
    main()
