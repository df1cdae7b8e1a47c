"""TPU validation: Pallas R-build exactness + timing at moderate scale.

Run: nohup python tools/tpu_build_check.py > /tmp/tpu_build_check.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from hwbloomradixjoin_tpu.ops import bitmap_join

    n_r = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_s = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    rng = np.random.default_rng(0)
    rk = rng.permutation(np.arange(1, n_r + 1)).astype(np.int32)
    sk = rng.integers(1, 2 * n_r, n_s).astype(np.int32)
    want = int((sk <= n_r).sum())
    lo, hi = 1, n_r

    pb, shift, slr = bitmap_join.plan_geometry(lo, hi)
    print(f"geom part_bits={pb} shift={shift} sl_rows={slr}", flush=True)

    # XLA golden bitmap
    t0 = time.perf_counter()
    want_bm = jax.jit(lambda k: bitmap_join.build_bitmap(
        k, lo, hi, pb, shift, slr))(jnp.asarray(rk))
    want_bm = np.asarray(want_bm)
    print(f"xla build: {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    plan = bitmap_join.plan_radix_join(rk, sk, lo, hi)
    print(f"plan: {time.perf_counter()-t0:.1f}s "
          f"build_usec={plan.build_usec:.0f} "
          f"({plan.build_usec*1e3/n_r:.2f} ns/R-tuple)", flush=True)

    cnt = plan.count()
    cntf = plan.full_count(1)
    print(f"count={cnt} full={cntf} want={want} "
          f"{'OK' if cnt == want == cntf else 'MISMATCH'}", flush=True)

    for name, fn in (("build", plan.time_build),
                     ("part", plan.time_partition),
                     ("probe", plan.time_probe)):
        print(f"{name}: {fn()/1e3:.1f} ms", flush=True)

    # steady-state full joins
    floor = bitmap_join.dispatch_floor_usec()
    for i in range(3):
        t0 = time.perf_counter()
        c = plan.full_count(10 + i)
        dt = (time.perf_counter() - t0) * 1e6
        print(f"full run {i}: raw={dt/1e3:.1f} ms floor={floor/1e3:.1f} "
              f"-> {max(dt-floor, 0.2*dt)/1e3:.1f} ms "
              f"({max(dt-floor, 0.2*dt)*1e3/n_s:.3f} ns/S-tuple) c={c}",
              flush=True)


if __name__ == "__main__":
    main()
