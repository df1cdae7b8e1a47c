"""Measure Pallas partition_pass + 32-way-select bitmap probe cost on TPU."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from hwbloomradixjoin_tpu.ops import radix as R

    rng = np.random.default_rng(0)
    n = 128 * 1024 * 1024 // 128  # 1M: quick compile sanity first
    for size in (1_048_576, 134_217_728):
        sk = jnp.asarray(rng.integers(1, 1 << 24, size).astype(np.int32))
        geom = R.RadixGeom(part_bits=7)
        f = jax.jit(lambda k: R.partition_pass(k, geom=geom))
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(sk))
        print(f"partition7 n={size}: first {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = jax.block_until_ready(f(sk))
        dt = (time.perf_counter() - t0) / reps
        print(f"partition7 n={size}: {dt*1e3:.1f} ms "
              f"= {dt*1e9/size:.3f} ns/elem", flush=True)

    # probe pattern: 32-way row-select gather over a (32,128) slice
    def probe_kern(slice_ref, keys_ref, out_ref):
        sl = slice_ref[:]                    # (32,128) bitmap words
        acc = jnp.zeros((8, 128), jnp.int32)
        for t in range(64):                  # 512-row block
            k = keys_ref[t * 8:(t + 1) * 8, :]
            widx = (k >> 5) & 4095
            lane = widx & 127
            row = widx >> 7
            v = jnp.zeros((8, 128), jnp.int32)
            for j in range(32):
                g = jnp.take_along_axis(
                    jnp.broadcast_to(sl[j:j + 1], (8, 128)), lane, axis=1)
                v = jnp.where(row == j, g, v)
            hit = (v >> (k & 31)) & 1
            acc = acc + hit
        out_ref[:] = acc

    NR = 65536  # 8.4M probes
    keys = jnp.asarray(rng.integers(0, 1 << 17, (NR, 128)).astype(np.int32))
    sl = jnp.asarray(rng.integers(0, 2**31, (32, 128)).astype(np.int32))
    f2 = pl.pallas_call(
        probe_kern,
        grid=(NR // 512,),
        in_specs=[pl.BlockSpec((32, 128), lambda i: (0, 0)),
                  pl.BlockSpec((512, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NR // 64, 128), jnp.int32),
    )
    out = jax.block_until_ready(f2(sl, keys))
    t0 = time.perf_counter()
    for _ in range(5):
        out = jax.block_until_ready(f2(sl, keys))
    dt = (time.perf_counter() - t0) / 5
    npr = NR * 128
    print(f"probe32sel: {npr/dt/1e9:.2f} G probes/s ({dt*1e3:.2f} ms, "
          f"= {dt*1e9/npr:.3f} ns/probe)", flush=True)


if __name__ == "__main__":
    main()
