"""Time the general Pallas radix join path on real TPU at production geometry."""
import sys
import time

import numpy as np


def main():
    r_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    s_size = int(sys.argv[2]) if len(sys.argv) > 2 else 128_000_000
    import jax
    import jax.numpy as jnp
    from hwbloomradixjoin_tpu.ops import radix as radix_ops

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    rk = rng.permutation(np.arange(1, r_size + 1)).astype(np.int32)
    sk = rng.integers(1, r_size + 1, s_size).astype(np.int32)
    print(f"datagen {time.perf_counter()-t0:.1f}s", flush=True)

    rk_d = jnp.asarray(rk)
    sk_d = jnp.asarray(sk)

    t0 = time.perf_counter()
    cnt, ovf = radix_ops.radix_join_count_pallas(rk_d, sk_d)
    cnt = int(cnt)
    print(f"first call: {time.perf_counter()-t0:.1f}s count={cnt} ovf={ovf}",
          flush=True)
    assert cnt == s_size, (cnt, s_size)

    for i in range(3):
        t0 = time.perf_counter()
        cnt, ovf = radix_ops.radix_join_count_pallas(rk_d, sk_d)
        cnt = int(cnt)
        dt = time.perf_counter() - t0
        print(f"run {i}: {dt:.3f}s  {dt*1e9/s_size:.3f} ns/tuple", flush=True)


if __name__ == "__main__":
    main()
