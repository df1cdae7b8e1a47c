"""The TPU radix-join engine: MSB radix partition + VMEM bitmap probe.

This is the hardware-conscious core, the engine the reference's PRO plays on
CPU (parallel_radix_join.c:255,735) re-derived from TPU constraints:

- The VPU's per-lane dynamic gather reaches 128 lanes (one vreg row), so a
  probe structure must be navigable with 128-word lookups — exactly like the
  reference's cache-line/TLB limits bounding per-pass radix fan-out
  (prj_params.h:15-22).  Partition fan-out is therefore chosen so each
  bucket's filter slice is `sl_rows` vreg rows (<= 32) that live in VMEM for
  the whole probe of that bucket — the VMEM-residency analogue of the
  blocked bloom filter's cache-line blocks (bloom_filter.c:125-141).
- Pass 1 (Pallas `partition_pass`, ops/radix.py) streams S through VMEM
  chunks, splitting each chunk bucket-major by the TOP bits of the
  normalized key (range partitioning), and *fuses pruning into the pass*:
  keys outside R's declared range drop into the pad category and never move
  again — the dataflow of parallel_radix_join_bloom.c:798-849 where S
  tuples failing the filter are dropped before the scatter.
- The probe kernel walks buckets; per grid step it DMAs one bucket's filter
  slice plus that bucket's runs from a group of chunks, then counts matches
  with vectorized 128-lane gathers + bit tests.  The bucket->runs
  descriptors are built on host ONCE per plan (the reference's task-
  generation role, parallel_radix_join.c:1130-1270) and reused across
  steady-state repeats — no host work in the timed loop.

Exactness: the filter is an *exact* bitmap over R's declared key range
(unique build keys => one bit per key, no false positives), so the count
needs no residual verification.  Non-unique build sides fall back to the
portable tiers (models/registry.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hwbloomradixjoin_tpu.ops import radix as radix_ops
from hwbloomradixjoin_tpu.ops.radix import LANES, PAD_KEY, _iota_flat

MAX_SL_ROWS = 32           # bucket filter slice: <= 32 vreg rows = 4096 words
C_ROWS = 16                # DMA window rows per (chunk, bucket) run
CH_PER_STEP = 32           # chunks gathered per probe grid step


def plan_geometry(lo: int, hi: int, chunk_rows: int = radix_ops.CHUNK_ROWS,
                  num_radix_bits: Optional[int] = None):
    """Derive (part_bits, shift, sl_rows) from the build-side key range.

    Each bucket covers 2^shift keys with shift in [12, 17]: the slice is
    then 1..32 vreg rows (<= 16 KiB) — VMEM-resident for the whole bucket
    probe.  Default fan-out is the minimum the range forces — fewer
    buckets = fatter runs = fewer DMAs, the TPU analogue of 'never use
    more radix bits than the caches force' (prj_params.h:15-22).

    num_radix_bits (RadixConfig / --engine-radix-bits) overrides the
    fan-out within the hardware-valid window [range-17, range-12] — the
    sweep axis of the reference's figure 9 (NUM_RADIX_BITS 12..17).
    """
    span = hi - lo + 1
    range_bits = max((max(span - 1, 1)).bit_length(), 12)
    lo_bits = max(range_bits - 17, 0)
    hi_bits = max(range_bits - 12, 0)
    part_bits = lo_bits if num_radix_bits is None else (
        min(max(num_radix_bits, lo_bits), hi_bits))
    shift = range_bits - part_bits            # in [12, 17]
    sl_rows = 1 << (shift - 12)               # 1..32 vreg rows per slice
    return part_bits, shift, sl_rows


def build_bitmap(r_key, lo: int, hi: int, part_bits: int, shift: int,
                 sl_rows: int):
    """Exact membership bitmap over [lo, hi], laid out (F * sl_rows, 128).

    Unique R keys => distinct (word, bit) pairs => scatter-ADD equals the
    reference's atomic fetch-OR (bloom_filter.c:84) with zero FPR.
    """
    nwords = (1 << part_bits) * sl_rows * LANES
    norm = r_key.astype(jnp.int32) - jnp.int32(lo)
    ok = (r_key >= lo) & (r_key <= hi)
    w = jnp.where(ok, norm >> 5, nwords)
    bit = (norm & 31).astype(jnp.uint32)
    bm = jnp.zeros(nwords, jnp.uint32).at[w].add(
        (jnp.uint32(1) << bit), mode="drop")
    return bm.astype(jnp.int32).reshape((1 << part_bits) * sl_rows, LANES)


BUF_ROWS = 4096            # probe staging buffer budget: 2 MiB of VMEM


def build_probe_descs(starts: np.ndarray, geom, total_rows: int):
    """Host-side: per-(chunk, bucket) run windows -> probe grid descriptors.

    starts: (nchunks, cat_rows, 128) from partition_pass.  The DMA window
    (c_rows) adapts to the largest run; the chunks-per-step count adapts to
    the VMEM staging budget.  Returns (row, vs, ve, ngroups, c_rows,
    ch_per_step) with (row, vs, ve) shaped (F * ngroups, ch_per_step), grid
    step g serving bucket g // ngroups — or None if one run exceeds the
    whole staging budget (heavy skew -> caller falls back).
    """
    nchunks = starts.shape[0]
    F = 1 << geom.part_bits
    flat = starts.reshape(nchunks, -1).astype(np.int64)[:, :F + 1]
    st, en = flat[:, :-1], flat[:, 1:]          # (nchunks, F)
    r0 = st >> 7
    r1 = -(-en // LANES)
    max_run = int((r1 - r0).max()) if nchunks else 1
    c_rows = max(8, (max_run + 7) & ~7)
    if c_rows > BUF_ROWS:
        return None
    ch_per_step = max(1, min(CH_PER_STEP, BUF_ROWS // c_rows, nchunks))

    chunk_elems = geom.chunk_rows * LANES
    base = np.arange(nchunks)[:, None] * geom.chunk_rows
    row = np.minimum(base + r0, max(total_rows - c_rows, 0))
    vs = st + np.arange(nchunks)[:, None] * chunk_elems - row * LANES
    ve = vs + (en - st)

    ngroups = -(-nchunks // ch_per_step)
    pad_chunks = ngroups * ch_per_step - nchunks
    if pad_chunks:
        zrow = np.zeros((pad_chunks, F), np.int64)
        row = np.concatenate([row, zrow])
        vs = np.concatenate([vs, zrow])
        ve = np.concatenate([ve, zrow])
    # (nchunks', F) -> (F, ngroups, ch_per_step) -> (G, ch_per_step)
    def arrange(a):
        return (a.reshape(ngroups, ch_per_step, F)
                 .transpose(2, 0, 1)
                 .reshape(F * ngroups, ch_per_step)
                 .astype(np.int32))
    return arrange(row), arrange(vs), arrange(ve), ngroups, c_rows, ch_per_step


def _probe_kernel_for(sl_rows: int, c_rows: int, ch_per_step: int,
                      lo: int, ngroups: int):
    wmask = sl_rows * LANES * 32 - 1  # bits per bucket - 1

    def kern(row_d, vs_d, ve_d, bm_ref, s_ref, out_ref, sbuf, sem, acc):
        g = pl.program_id(0)
        ng = pl.num_programs(0)

        @pl.when(g == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        copies = [pltpu.make_async_copy(
            s_ref.at[pl.ds(row_d[g, t], c_rows), :],
            sbuf.at[pl.ds(t * c_rows, c_rows), :], sem)
            for t in range(ch_per_step)]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        sl = bm_ref[:]                       # (sl_rows, 128) bucket slice
        base_iota = _iota_flat((8, LANES))

        # fori loops (not python unrolls) keep compiled size independent of
        # the (c_rows, ch_per_step) geometry — only sl_rows is unrolled
        def chunk_body(t, _):
            vs = vs_d[g, t]
            ve = ve_d[g, t]

            def row_body(u, _):
                r = pl.multiple_of(t * c_rows + u * 8, 8)
                k = sbuf[pl.ds(r, 8), :]
                flat = base_iota + u * (8 * LANES)
                ok = (flat >= vs) & (flat < ve)
                norm = k - jnp.int32(lo)
                widx = (norm >> 5) & (wmask >> 5)
                lane = widx & (LANES - 1)
                rowj = widx >> 7
                if sl_rows == 1:
                    v = jnp.take_along_axis(
                        jnp.broadcast_to(sl[0:1], (8, LANES)), lane, axis=1)
                else:
                    v = jnp.zeros((8, LANES), jnp.int32)
                    for j in range(sl_rows):
                        gth = jnp.take_along_axis(
                            jnp.broadcast_to(sl[j:j + 1], (8, LANES)),
                            lane, axis=1)
                        v = jnp.where(rowj == j, gth, v)
                acc[:] += jnp.where(ok, (v >> (norm & 31)) & 1, 0)
                return 0

            return jax.lax.fori_loop(0, c_rows // 8, row_body, 0)

        jax.lax.fori_loop(0, ch_per_step, chunk_body, 0)

        @pl.when(g == ng - 1)
        def _():
            out_ref[0, 0] = jnp.sum(acc[:])
    return kern


def bitmap_probe_count(bitmap, s_part, row_d, vs_d, ve_d, ngroups: int,
                       sl_rows: int, lo: int, interpret: bool = False,
                       c_rows: int = C_ROWS, ch_per_step: int = CH_PER_STEP):
    """Count S matches: grid over (bucket x chunk-group) probe steps."""
    G = row_d.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((sl_rows, LANES), lambda g, *_: (g // ngroups, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((ch_per_step * c_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _probe_kernel_for(sl_rows, c_rows, ch_per_step, lo, ngroups),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True),
    )(row_d, vs_d, ve_d, bitmap, s_part)
    return out[0, 0]


@dataclasses.dataclass
class RadixJoinPlan:
    """Compiled + descriptor-cached radix join; steady state is device-only.

    count() issues the partition and probe programs back to back — the
    probe consumes the fresh partition output, so repeats serialize
    on-device (real work each time) while the two dispatches pipeline.
    """

    count_fn: "callable"        # chain:int32 -> count (partition -> probe)
    part_fn: "callable"         # chain -> partitioned S (for phase timing)
    probe_fn: "callable"        # chain -> count (probe only, cached partition)
    s_tuples: int

    def count(self, chain=0) -> int:
        return int(self.count_fn(jnp.int32(chain)))

    def time_partition(self) -> float:
        t0 = time.perf_counter()
        jax.block_until_ready(self.part_fn(jnp.int32(1)))
        return (time.perf_counter() - t0) * 1e6

    def time_probe(self) -> float:
        t0 = time.perf_counter()
        jax.block_until_ready(self.probe_fn(jnp.int32(1)))
        return (time.perf_counter() - t0) * 1e6


def plan_radix_join(r_key, s_key, lo: int, hi: int,
                    interpret: bool = False,
                    chunk_rows: int = radix_ops.CHUNK_ROWS,
                    num_radix_bits: Optional[int] = None):
    """Build a radix-join plan: bitmap, one partition pass, descriptors.

    Requires unique R keys in [lo, hi] (caller checks stats).  Returns None
    if the probe window capacity can't serve the partition layout.
    """
    part_bits, shift, sl_rows = plan_geometry(lo, hi, chunk_rows,
                                              num_radix_bits)
    geom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=part_bits,
                               lo=lo, hi=hi, shift=shift)
    chunk = chunk_rows * LANES

    bitmap = jax.jit(
        lambda rk: build_bitmap(rk, lo, hi, part_bits, shift, sl_rows)
    )(r_key)

    part = jax.jit(lambda sk, chain: radix_ops.partition_pass(
        sk + chain * 0, interpret=interpret, geom=geom))
    sk_in = radix_ops._chunk_pad(jnp.asarray(s_key, jnp.int32), chunk)
    s_part, starts = part(sk_in, jnp.int32(0))
    descs = build_probe_descs(np.asarray(starts).reshape(
        -1, geom.cat_rows, LANES), geom, s_part.shape[0])
    if descs is None:
        return None
    row_d, vs_d, ve_d, ngroups, c_rows, ch_per_step = descs
    row_d, vs_d, ve_d = (jnp.asarray(a) for a in (row_d, vs_d, ve_d))

    def probe_arg(sp2, chain):
        return bitmap_probe_count(
            bitmap, sp2, row_d + chain * 0, vs_d, ve_d, ngroups, sl_rows,
            lo, interpret=interpret, c_rows=c_rows, ch_per_step=ch_per_step)

    probe_jit = jax.jit(probe_arg)
    # warm so steady-state and phase timings exclude compiles
    jax.block_until_ready(probe_jit(s_part, jnp.int32(0)))

    def count_fn(chain):
        sp2, _ = part(sk_in, chain)
        return probe_jit(sp2, chain)

    return RadixJoinPlan(count_fn=count_fn,
                         part_fn=lambda c: part(sk_in, c),
                         probe_fn=lambda c: probe_jit(s_part, c),
                         s_tuples=int(s_key.shape[0]))
