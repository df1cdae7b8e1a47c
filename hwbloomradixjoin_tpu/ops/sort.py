"""Radix sort operator.

The reference's radix-clustering pass *is* an MSB radix-sort pass
(radix_cluster, parallel_radix_join.c:570); exposed here as a standalone
sort operator over (key, payload) columns.

XLA tier: jax.lax.sort (TPU's native sort).  The Pallas tier composes the
radix partition kernels (ops/radix.py) — partition by high bits to
VMEM-sized buckets, sort within bucket — and inherits their throughput
characteristics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
