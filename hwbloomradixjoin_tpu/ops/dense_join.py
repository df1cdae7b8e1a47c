"""Dense perfect-hash join fast path.

When the build side is a *declared dense primary key* (keys = a permutation
of [lo, hi], KeyStats.is_dense_pk), the hash table is the identity function:
membership of a probe key is exactly ``lo <= key <= hi`` and each match has
multiplicity one.  Count-mode joins (the reference's default measurement mode,
src/main.c:117-123: "joins never materialize, we only count") then collapse to
a streaming range test — no shuffle, no table, HBM-bandwidth bound.

This is the classic perfect-hash / dense-key join optimization of modern
vectorized engines, planner-selected from constraint metadata the generators
set by construction.  All benchmark workloads (uniform PK in [1,|R|], Zipf
alphabet [1,|R|]) qualify on the build side.

The kernel also accumulates the matched-S-payload checksum so results remain
cross-checkable against the scalar ground truth (matched-R-payload checksums
require a gather and are only produced by the general path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _make_kernel(lo: int, hi: int):
    def kernel(chain_ref, k_ref, p_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            # chain*0: value-free data dependency on the previous repeat so
            # back-to-back benchmark executions cannot be elided or served
            # from any dispatch cache (results are unchanged)
            acc_ref[0] = chain_ref[0] * 0
            acc_ref[1] = 0

        keys = k_ref[:]
        hit = (keys >= jnp.int32(lo)) & (keys <= jnp.int32(hi))
        acc_ref[0] += jnp.sum(hit.astype(jnp.int32))
        # int32 wraparound sum == uint32 wraparound sum, and Mosaic lacks
        # unsigned reductions — accumulate as int32, reinterpret at the end
        spay = jnp.where(hit, p_ref[:], 0)
        acc_ref[1] += jnp.sum(spay, dtype=jnp.int32)

        @pl.when(i == n - 1)
        def _():
            out_ref[0, 0] = acc_ref[0]
            out_ref[0, 1] = acc_ref[1]

    return kernel


@partial(jax.jit, static_argnames=("lo", "hi", "block_rows", "interpret"))
def dense_count_join(s_key, s_pay, lo: int, hi: int, block_rows: int = 2048,
                     interpret: bool = False, chain=None):
    """Streaming count join against a dense PK build side [lo, hi].

    Returns (count:int32, sum_s_payload:uint32).  Inputs are flat int32
    arrays; length must be a multiple of 128 (callers pad with PAD_KEY,
    which is < lo for all valid lo >= 0 and so never matches).  `chain` is an
    optional int32 scalar folded in as a no-op (see _make_kernel).
    """
    if chain is None:
        chain = jnp.int32(0)
    n = s_key.shape[0]
    assert n % LANES == 0
    rows = n // LANES
    block_rows = min(block_rows, rows)
    # pad rows to a block multiple so every grid step sees a full block
    # (PAD_KEY rows never match: PAD_KEY < 0 <= lo)
    rem = (-rows) % block_rows
    if rem:
        s_key = jnp.concatenate(
            [s_key, jnp.full((rem * LANES,), jnp.int32(-2147483648))])
        s_pay = jnp.concatenate([s_pay, jnp.zeros((rem * LANES,), jnp.int32)])
        rows += rem
    k2 = s_key.reshape(rows, LANES)
    p2 = s_pay.reshape(rows, LANES)
    grid = rows // block_rows

    out = pl.pallas_call(
        _make_kernel(lo, hi),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(chain.reshape(1), k2, p2)
    return out[0, 0], out[0, 1].astype(jnp.uint32)


def pad_to_rows(arr, pad_value, lanes: int = LANES):
    """Pad a flat array to a multiple of 128 with a sentinel."""
    n = arr.shape[0]
    rem = (-n) % lanes
    if rem == 0:
        return arr
    return jnp.concatenate([arr, jnp.full((rem,), pad_value, arr.dtype)])
