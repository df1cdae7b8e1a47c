"""PRHO: histogram re-order + vectorized probe over partitioned data.

The reference's PRHO (parallel_radix_join.c:438-555) re-orders each
partition by a histogram then probes with an SSE 4-wide pipelined loop —
the "SIMD probe" member of the PRO/PRH/PRHO trio (figure 11).  The TPU
re-derivation keeps what makes it distinct from PRO:

- the per-partition build structure is a RE-ORDERED DENSE TABLE, not a
  bucket chain: here a per-key COUNT table plus a per-key PAYLOAD-SUM
  table over the bucket's key sub-range, both VMEM-resident slices during
  the probe of that bucket;
- the probe is fully vectorized (the 128-lane gather ladder — the VPU form
  of the SSE probe), and supports NON-UNIQUE build sides (counts carry
  multiplicity) plus both checksums — unlike PRO's exact-bitmap engine,
  which is count-only over unique builds.

Cost structure mirrors the reference's figure-11 ordering: the count/pay
tables are 32x less dense than PRO's bitmap (4 B/key vs 1 bit/key), so
slices cover 2^14 keys instead of 2^17 and the partition pass needs 3 more
radix bits — PRHO lands slower than PRO on TPU exactly as it does on CPU
(11.35 vs 9.85 ns/tuple, base_results/figure11).

S payloads ride the partition pass (partition_pass_kv) so the probe can
accumulate the S-side checksum; all sums are mod 2^32 (uint32 wraparound,
matching the reference's unsigned accumulators).
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

from hwbloomradixjoin_tpu.ops import bitmap_join, radix as radix_ops
from hwbloomradixjoin_tpu.ops.radix import LANES, PAD_KEY

MAX_SLICE_ROWS = 128       # slice covers 2^14 keys = 64 KiB of counts


def plan_geometry_counts(lo: int, hi: int,
                         num_radix_bits: Optional[int] = None):
    """(part_bits, shift, slice_rows) for word-granular (count) slices."""
    span = hi - lo + 1
    range_bits = max((max(span - 1, 1)).bit_length(), 7)
    lo_bits = max(range_bits - 14, 0)
    hi_bits = max(range_bits - 7, 0)
    part_bits = lo_bits if num_radix_bits is None else (
        min(max(num_radix_bits, lo_bits), hi_bits))
    shift = range_bits - part_bits            # in [7, 14]
    slice_rows = max(1 << (shift - 7), 8)     # 8-row Mosaic alignment
    return part_bits, shift, slice_rows


def build_tables(r_key, r_pay, lo: int, hi: int, part_bits: int,
                 shift: int, slice_rows: int):
    """Per-key count + payload-sum tables, laid out (F*slice_rows, 128).

    Bucket-strided like build_bitmap (slice tails stay zero when the
    stride exceeds 2^shift slots).  The reference's histogram re-order
    build (histogram_optimized_join); XLA scatter-add, plan-time only.
    """
    nslots = (1 << part_bits) * slice_rows * LANES
    norm = r_key.astype(jnp.int32) - jnp.int32(lo)
    ok = (r_key >= lo) & (r_key <= hi)
    bucket = norm >> shift
    local = norm & ((1 << shift) - 1)
    idx = jnp.where(ok, bucket * (slice_rows * LANES) + local, nslots)
    cnt = jnp.zeros(nslots, jnp.int32).at[idx].add(1, mode="drop")
    pay = jnp.zeros(nslots, jnp.uint32).at[idx].add(
        r_pay.astype(jnp.uint32), mode="drop").astype(jnp.int32)
    rows = nslots // LANES
    return cnt.reshape(rows, LANES), pay.reshape(rows, LANES)


def _probe_kernel_for(geom: bitmap_join.ProbeGeom):
    sl_rows = geom.sl_rows            # slice rows (words per 128 lanes)
    c_rows = geom.c_rows
    ch = geom.ch_per_step
    ngroups = geom.ngroups
    nchunks = geom.nchunks
    nt = geom.ntiles
    lo = geom.lo
    shift = geom.shift
    local_mask = (1 << shift) - 1

    def kern(row_d, own_d, cnt_ref, pay_ref, s_ref, sp_ref,
             out_c, out_r, out_s, sbuf, pbuf, sem, accc, accr, accs):
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        b = g // (ngroups * nt)
        gi = (g // nt) - b * ngroups

        @pl.when(g == 0)
        def _():
            accc[:] = jnp.zeros_like(accc)
            accr[:] = jnp.zeros_like(accr)
            accs[:] = jnp.zeros_like(accs)

        nlive = jnp.minimum(nchunks - gi * ch, ch)
        copies = []
        for t in range(ch):
            @pl.when(t < nlive)
            def _():
                pltpu.make_async_copy(
                    s_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    sbuf.at[pl.ds(t * c_rows, c_rows), :], sem).start()
                pltpu.make_async_copy(
                    sp_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    pbuf.at[pl.ds(t * c_rows, c_rows), :], sem).start()
        for t in range(ch):
            @pl.when(t < nlive)
            def _():
                pltpu.make_async_copy(
                    s_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    sbuf.at[pl.ds(t * c_rows, c_rows), :], sem).wait()
                pltpu.make_async_copy(
                    sp_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    pbuf.at[pl.ds(t * c_rows, c_rows), :], sem).wait()

        cnt_sl = cnt_ref[:]
        pay_sl = pay_ref[:]
        live_rows = nlive * c_rows
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def sub(u, _):
            t = u // (c_rows // 8)
            r = pl.multiple_of(u * 8, 8)
            k = sbuf[pl.ds(r, 8), :]
            sp = pbuf[pl.ds(r, 8), :]
            norm = k - jnp.int32(lo)
            abs_row = row_d[0, 0, t] + (r - t * c_rows) + row_iota
            owned = (abs_row >= own_d[0, 0, t]) \
                & (abs_row < own_d[0, 0, t] + c_rows)
            ok = ((norm >> shift) == b) & owned
            local = norm & local_mask
            lane = local & (LANES - 1)
            rowj = local >> 7
            cv = jnp.zeros((8, LANES), jnp.int32)
            pv = jnp.zeros((8, LANES), jnp.int32)
            for j in range(sl_rows):
                hit = rowj == j
                cg = jnp.take_along_axis(
                    jnp.broadcast_to(cnt_sl[j:j + 1], (8, LANES)),
                    lane, axis=1)
                pg = jnp.take_along_axis(
                    jnp.broadcast_to(pay_sl[j:j + 1], (8, LANES)),
                    lane, axis=1)
                cv = jnp.where(hit, cg, cv)
                pv = jnp.where(hit, pg, pv)
            cv = jnp.where(ok, cv, 0)
            accc[:] += cv
            accr[:] += jnp.where(ok, pv, 0)
            accs[:] += sp * cv           # mod 2^32
            return 0

        jax.lax.fori_loop(0, live_rows // 8, sub, 0)

        @pl.when(g == ng - 1)
        def _():
            out_c[0, 0] = jnp.sum(accc[:])
            out_r[0, 0] = jnp.sum(accr[:])
            out_s[0, 0] = jnp.sum(accs[:])
    return kern


def probe_count_sums(cnt_tbl, pay_tbl, s_part, sp_part, row_d, own_d,
                     geom: bitmap_join.ProbeGeom, interpret: bool = False):
    gnt = geom.ngroups * geom.ntiles
    blk_slice = pl.BlockSpec(
        (geom.sl_rows, LANES),
        lambda g, gnt=gnt: (g // gnt, 0),
        memory_space=pltpu.VMEM)
    smem_desc = pl.BlockSpec((1, 1, geom.ch_per_step), lambda g: (g, 0, 0),
                             memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        _probe_kernel_for(geom),
        grid=(geom.grid,),
        in_specs=[
            smem_desc, smem_desc,
            blk_slice, blk_slice,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.SMEM)
                        for _ in range(3)),
        out_shape=tuple(jax.ShapeDtypeStruct((1, 1), jnp.int32)
                        for _ in range(3)),
        scratch_shapes=[
            pltpu.VMEM((geom.ch_per_step * geom.c_rows, LANES), jnp.int32),
            pltpu.VMEM((geom.ch_per_step * geom.c_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=bitmap_join.VMEM_LIMIT),
    )(row_d, own_d, cnt_tbl, pay_tbl, s_part, sp_part)
    c, r, s = outs
    return c[0, 0], r[0, 0], s[0, 0]


@dataclasses.dataclass
class PrhoPlan:
    count_fn: "callable"        # chain -> (count, sum_rpay, sum_spay)
    part_fn: "callable"
    probe_fn: "callable"
    s_tuples: int
    build_usec: float
    geom: bitmap_join.ProbeGeom

    def count3(self, chain=0):
        c, r, s = self.count_fn(jnp.int32(chain))
        return int(c), int(np.uint32(int(r) & 0xFFFFFFFF)), int(
            np.uint32(int(s) & 0xFFFFFFFF))

    _time = bitmap_join.RadixJoinPlan._time
    time_partition = bitmap_join.RadixJoinPlan.time_partition
    time_probe = bitmap_join.RadixJoinPlan.time_probe


def plan_prho_join(r_key, r_pay, s_key, s_pay, lo: int, hi: int,
                   interpret: bool = False,
                   chunk_rows: int = bitmap_join.CHUNK_ROWS,
                   num_radix_bits: Optional[int] = None):
    """PRHO plan: count/pay tables + payload-routing partition + probe.

    Works for non-unique R (counts carry multiplicity).  Returns None on
    heavy skew (window overflow), like plan_radix_join.
    """
    if interpret:
        chunk_rows = min(chunk_rows, 1024)
    part_bits, shift, slice_rows = plan_geometry_counts(lo, hi,
                                                        num_radix_bits)
    pgeom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=part_bits,
                                lo=lo, hi=hi, shift=shift)
    chunk = chunk_rows * LANES

    t0 = time.perf_counter()
    cnt_tbl, pay_tbl = jax.jit(lambda rk, rp: build_tables(
        rk, rp, lo, hi, part_bits, shift, slice_rows))(r_key, r_pay)
    cnt_tbl = jax.block_until_ready(cnt_tbl)
    build_usec = (time.perf_counter() - t0) * 1e6

    part = jax.jit(lambda sk, sp, chain: radix_ops.partition_pass_kv(
        sk + chain * 0, sp, interpret=interpret, geom=pgeom))
    sk_in = radix_ops._chunk_pad(s_key, chunk)
    sp_in = radix_ops._chunk_pad(s_pay, chunk)
    nchunks = sk_in.shape[0] // chunk
    s_part, sp_part, starts = part(sk_in, sp_in, jnp.int32(0))

    F = 1 << part_bits
    st = np.asarray(starts).reshape(nchunks, -1)[:, :F + 1].astype(np.int64)
    max_run = int((st[:, 1:] - st[:, :-1]).max()) if nchunks else 1
    geom = bitmap_join._probe_geom(part_bits, shift, slice_rows, lo,
                                   chunk_rows, nchunks, max_run)
    # two staging buffers halve the budget
    if geom.ch_per_step > 1:
        geom = dataclasses.replace(
            geom, ch_per_step=max(1, geom.ch_per_step // 2),
            ngroups=-(-nchunks // max(1, geom.ch_per_step // 2)))

    def count_from(sk, sp, chain):
        s2, p2, stt = part(sk, sp, chain)
        rd, od = bitmap_join.derive_descs(stt.reshape(nchunks, -1, LANES),
                                          geom)
        return probe_count_sums(cnt_tbl, pay_tbl, s2, p2, rd, od, geom,
                                interpret=interpret)

    count_jit = jax.jit(count_from)
    jax.block_until_ready(count_jit(sk_in, sp_in, jnp.int32(0)))
    rd0 = jax.jit(lambda s: bitmap_join.derive_descs(
        s.reshape(nchunks, -1, LANES), geom))(starts)
    probe_jit = jax.jit(lambda chain: probe_count_sums(
        cnt_tbl, pay_tbl, s_part, sp_part + chain * 0, rd0[0], rd0[1], geom,
        interpret=interpret)[0])
    part_scalar = jax.jit(lambda chain: part(
        sk_in, sp_in, chain)[0].ravel()[-1].astype(jnp.int32))

    return PrhoPlan(
        count_fn=lambda c: count_jit(sk_in, sp_in, c),
        part_fn=part_scalar,
        probe_fn=probe_jit,
        s_tuples=int(s_key.shape[0]),
        build_usec=build_usec, geom=geom)
