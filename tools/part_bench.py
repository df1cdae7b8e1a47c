"""Quick partition-pass timing on the real chip.

Chained executions inside one device program (dispatch-floor-free);
prints ns/elem for the S-partition kernel at given geometry.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from hwbloomradixjoin_tpu.ops import radix as radix_ops

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 128_000_000
    part_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    shift = int(sys.argv[3]) if len(sys.argv) > 3 else 19
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    rng = np.random.default_rng(0)
    hi = (1 << (part_bits + shift)) - 1
    sk = rng.integers(0, hi + 1, n).astype(np.int32)
    geom = radix_ops.RadixGeom(chunk_rows=4096, part_bits=part_bits,
                               lo=0, hi=hi, shift=shift)
    sk_in = radix_ops._chunk_pad(sk, 4096 * radix_ops.LANES)

    def one(sk, c):
        kp, st = radix_ops.partition_pass(sk + c * 0, geom=geom)
        return kp.ravel()[-1] + st.ravel()[-1]

    def chained(sk, r):
        def body(i, acc):
            return one(sk, i + acc * 0)
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    f = jax.jit(chained)
    t0 = time.perf_counter()
    int(f(sk_in, jnp.int32(1)))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    int(f(sk_in, jnp.int32(reps)))
    dt = (time.perf_counter() - t0) / reps
    print(f"partition {n} elems bits={part_bits} shift={shift}: "
          f"{dt*1e3:.1f} ms/pass = {dt/n*1e9:.3f} ns/elem "
          f"({2*4*n/dt/1e9:.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
