import time
import numpy as np
import jax
import jax.numpy as jnp
from hwbloomradixjoin_tpu.ops import bitmap_join, radix as radix_ops


def stage(msg, t0):
    print(f"[{time.perf_counter()-t0:7.1f}s] {msg}", flush=True)


def main():
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    n_r, n_s = 1_000_000, 8_000_000
    rk = jnp.asarray(rng.permutation(np.arange(1, n_r + 1)).astype(np.int32))
    sk = jnp.asarray(rng.integers(1, n_r + 1, n_s).astype(np.int32))
    stage("data", t0)

    lo, hi = 1, n_r
    part_bits, shift, sl_rows = bitmap_join.plan_geometry(lo, hi)
    stage(f"geom part_bits={part_bits} shift={shift} sl_rows={sl_rows}", t0)
    geom = radix_ops.RadixGeom(part_bits=part_bits, lo=lo, hi=hi, shift=shift)
    bm = jax.jit(lambda r: bitmap_join.build_bitmap(
        r, lo, hi, part_bits, shift, sl_rows))(rk)
    jax.block_until_ready(bm)
    stage(f"bitmap {bm.shape}", t0)

    chunk = geom.chunk_rows * 128
    sk_in = radix_ops._chunk_pad(sk, chunk)
    s_part, starts = jax.jit(
        lambda k: radix_ops.partition_pass(k, geom=geom))(sk_in)
    jax.block_until_ready(s_part)
    stage(f"partition {s_part.shape}", t0)

    descs = bitmap_join.build_probe_descs(
        np.asarray(starts).reshape(-1, geom.cat_rows, 128), geom,
        s_part.shape[0])
    row_d, vs_d, ve_d, ngroups, c_rows, ch = descs
    stage(f"descs G={row_d.shape} ngroups={ngroups} c_rows={c_rows} ch={ch}",
          t0)

    cnt = bitmap_join.bitmap_probe_count(
        bm, s_part, jnp.asarray(row_d), jnp.asarray(vs_d), jnp.asarray(ve_d),
        ngroups, sl_rows, lo, c_rows=c_rows, ch_per_step=ch)
    stage(f"probe compiled+ran count={int(cnt)} want={n_s}", t0)


if __name__ == "__main__":
    main()
