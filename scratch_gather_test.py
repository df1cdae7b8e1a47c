"""Probe Mosaic in-kernel gather support + XLA count-table join speed."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # --- 1. in-kernel per-lane gather candidates (tiny shapes) ---
    T_ROWS, N_ROWS = 64, 8

    def k_take_axis0(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]            # (T_ROWS, 128)
        idx = idx_ref[:]            # (N_ROWS, 128) values in [0, T_ROWS)
        out_ref[:] = jnp.take_along_axis(tbl, idx, axis=0)[:N_ROWS]

    def k_take_axis1(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]
        idx = idx_ref[:] % 128
        out_ref[:] = jnp.take_along_axis(tbl[:N_ROWS], idx, axis=1)

    tbl = jnp.arange(T_ROWS * 128, dtype=jnp.int32).reshape(T_ROWS, 128)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, T_ROWS, (N_ROWS, 128)),
        dtype=jnp.int32)

    for name, kern in [("take_axis0", k_take_axis0),
                       ("take_axis1", k_take_axis1)]:
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((N_ROWS, 128), jnp.int32),
            )(tbl, idx)
            ref = (np.take_along_axis(np.asarray(tbl), np.asarray(idx), 0)
                   if name == "take_axis0" else
                   np.take_along_axis(np.asarray(tbl)[:N_ROWS],
                                      np.asarray(idx) % 128, 1))
            ok = np.array_equal(np.asarray(out), ref)
            print(f"{name}: COMPILES, correct={ok}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

    # --- 2. XLA count-table join at production geometry ---
    from hwbloomradixjoin_tpu.ops import ht_join
    r_size, s_size = 16_000_000, 128_000_000
    rng = np.random.default_rng(0)
    rk = jnp.asarray(rng.permutation(np.arange(1, r_size + 1)).astype(np.int32))
    sk = jnp.asarray(rng.integers(1, r_size + 1, s_size).astype(np.int32))
    rp = jnp.arange(r_size, dtype=jnp.int32)
    sp = jnp.arange(s_size, dtype=jnp.int32)
    print("data ready", flush=True)

    f = jax.jit(lambda a, b, c, d: ht_join.counttable_join_count(
        a, b, c, d, 1, r_size))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(rk, rp, sk, sp))
    print(f"counttable compile+run {time.perf_counter()-t0:.1f}s "
          f"count={int(out[0])}", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(rk, rp, sk, sp))
        dt = time.perf_counter() - t0
        print(f"counttable run {dt*1e3:.1f} ms = {dt*1e9/s_size:.3f} ns/tuple",
              flush=True)

    f2 = jax.jit(lambda a, b, c, d: ht_join.counttable_join_count(
        a, b, c, d, 1, r_size, with_checksums=False))
    out = jax.block_until_ready(f2(rk, rp, sk, sp))
    for i in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f2(rk, rp, sk, sp))
        dt = time.perf_counter() - t0
        print(f"counttable(no-cksum) {dt*1e3:.1f} ms = "
              f"{dt*1e9/s_size:.3f} ns/tuple", flush=True)


if __name__ == "__main__":
    main()
