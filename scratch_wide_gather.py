"""Verify wide-row (4096-lane) take_along_axis gather in a Pallas TPU kernel."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    W = 4096
    ROWS = 512

    def kern(tbl_ref, idx_ref, out_ref):
        bm = tbl_ref[:]                      # (1, W)
        arr = jnp.broadcast_to(bm, (8, W))
        acc = jnp.zeros((8, 128), jnp.int32)
        for t in range(ROWS // 8):
            idx = idx_ref[t * 8:(t + 1) * 8, :]
            v = jnp.take_along_axis(arr, idx, axis=1)
            acc = acc + v
        out_ref[:] = acc

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 100, (1, W)), dtype=jnp.int32)
    idx = jnp.asarray(rng.integers(0, W, (ROWS, 128)), dtype=jnp.int32)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(tbl, idx)
        ref = np.asarray(tbl)[0][np.asarray(idx)].reshape(ROWS // 8, 8, 128
                                                          ).sum(0)
        print("wide gather W=4096: COMPILES, correct =",
              np.array_equal(np.asarray(out), ref), flush=True)
    except Exception as e:
        print(f"W=4096 FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return

    # throughput: big grid over many row-blocks
    N_ROWS = 65536  # 8.4M gathers

    def kern2(tbl_ref, idx_ref, out_ref):
        arr = jnp.broadcast_to(tbl_ref[:], (8, W))
        acc = jnp.zeros((8, 128), jnp.int32)
        for t in range(64):
            idx = idx_ref[t * 8:(t + 1) * 8, :]
            acc = acc + jnp.take_along_axis(arr, idx, axis=1)
        out_ref[:] = acc

    big_idx = jnp.asarray(rng.integers(0, W, (N_ROWS, 128)), dtype=jnp.int32)
    f = pl.pallas_call(
        kern2,
        grid=(N_ROWS // 512,),
        in_specs=[pl.BlockSpec((1, W), lambda i: (0, 0)),
                  pl.BlockSpec((512, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N_ROWS // 64, 128), jnp.int32),
    )
    out = jax.block_until_ready(f(tbl, big_idx))
    t0 = time.perf_counter()
    for _ in range(5):
        out = jax.block_until_ready(f(tbl, big_idx))
    dt = (time.perf_counter() - t0) / 5
    n = N_ROWS * 128
    print(f"gather throughput: {n/dt/1e9:.2f} G gathers/s "
          f"({dt*1e3:.2f} ms for {n/1e6:.1f}M)", flush=True)


if __name__ == "__main__":
    main()
