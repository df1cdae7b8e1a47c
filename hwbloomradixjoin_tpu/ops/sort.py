"""Radix sort / radix clustering operators.

The reference's radix-clustering pass *is* an MSB radix-sort pass
(radix_cluster, parallel_radix_join.c:570); exposed here as standalone
operators over (key, payload) columns:

- ``radix_cluster``: the Pallas tier — one partition_pass (ops/radix.py)
  MSB-clusters the column into 2^bits contiguous-per-chunk bucket runs
  with per-chunk start offsets.  This is the exact operator the join
  engine's S pass runs, reused standalone (BASELINE operator set #10).
- ``radix_sort``: full ordering via jax.lax.sort (XLA's native TPU sort,
  measured ~0.3 G elem/s — tools/microbench.py).  Data-dependent full
  permutations have no faster TPU formulation (no cross-sublane gather),
  so XLA's sort IS the right tier for total order; the Pallas cluster tier
  covers the partial (bucket) order the join pipeline needs at
  ~0.32 ns/elem/bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hwbloomradixjoin_tpu.ops import radix as radix_ops


def radix_cluster(keys, lo: int, hi: int, bits: int,
                  interpret: bool = False, chunk_rows: int = 1024):
    """MSB radix-cluster keys into 2^bits buckets (Pallas partition pass).

    Returns (clustered (rows, 128) int32, starts (nchunks, cat_rows, 128)):
    within each chunk, bucket b's run is [starts[c, b], starts[c, b+1])
    in flat order, out-of-range keys and PAD fill sort to the tail.
    """
    span = hi - lo + 1
    range_bits = max((max(span - 1, 1)).bit_length(), bits)
    geom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=bits,
                               lo=lo, hi=hi, shift=range_bits - bits)
    chunk = chunk_rows * radix_ops.LANES
    kin = radix_ops._chunk_pad(jnp.asarray(keys, jnp.int32), chunk)
    out, starts = radix_ops.partition_pass(kin, interpret=interpret,
                                           geom=geom)
    nchunks = kin.shape[0] // chunk
    return out, starts.reshape(nchunks, geom.cat_rows, radix_ops.LANES)


def radix_sort(keys, *payloads, descending: bool = False):
    """Sort rows by key; payload columns follow.  Stable."""
    ops = (keys, *payloads)
    if descending:
        out = jax.lax.sort(tuple(jnp.bitwise_not(keys) if i == 0 else o
                                 for i, o in enumerate(ops)), num_keys=1,
                           is_stable=True)
        return (jnp.bitwise_not(out[0]), *out[1:])
    out = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return out if len(ops) > 1 else out[0]
