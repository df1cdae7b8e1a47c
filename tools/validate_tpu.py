"""TPU validation + timing of the bitmap radix join engine."""
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from hwbloomradixjoin_tpu.ops import bitmap_join

    rng = np.random.default_rng(0)

    # small validation first
    n_r, n_s = 1_000_000, 8_000_000
    rk = rng.permutation(np.arange(1, n_r + 1)).astype(np.int32)
    sk = rng.integers(1, n_r + 1, n_s).astype(np.int32)
    t0 = time.perf_counter()
    plan = bitmap_join.plan_radix_join(jnp.asarray(rk), jnp.asarray(sk),
                                       1, n_r)
    assert plan is not None
    got = plan.count()
    print(f"small: plan+count {time.perf_counter()-t0:.1f}s "
          f"count={got} want={n_s} {'OK' if got == n_s else 'FAIL'}",
          flush=True)
    assert got == n_s

    # production geometry
    n_r, n_s = 16_000_000, 128_000_000
    rk = rng.permutation(np.arange(1, n_r + 1)).astype(np.int32)
    sk = rng.integers(1, n_r + 1, n_s).astype(np.int32)
    t0 = time.perf_counter()
    plan = bitmap_join.plan_radix_join(jnp.asarray(rk), jnp.asarray(sk),
                                       1, n_r)
    assert plan is not None
    got = plan.count()
    print(f"big: plan+count {time.perf_counter()-t0:.1f}s count={got} "
          f"want={n_s} {'OK' if got == n_s else 'FAIL'}", flush=True)

    # chained steady-state timing (defeats dispatch caching)
    reps = 10
    t0 = time.perf_counter()
    c = 0
    for i in range(reps):
        c = plan.count(chain=c * 0 + i)
    dt = (time.perf_counter() - t0) / reps
    print(f"steady: {dt*1e3:.2f} ms = {dt*1e9/n_s:.4f} ns/tuple "
          f"({n_s/dt/1e9:.2f} G rows/s)", flush=True)
    print(f"part {plan.time_partition()/1e3:.2f} ms  "
          f"probe {plan.time_probe()/1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
