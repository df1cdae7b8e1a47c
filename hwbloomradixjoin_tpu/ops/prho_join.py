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


def _build_kernel_for(geom: bitmap_join.ProbeGeom):
    """Count + paysum table build: MXU one-hot deposit over partitioned R.

    Same window machinery as bitmap_join._build_kernel_for, but deposits
    COUNTS (val=1, duplicates accumulate multiplicity) and PAYLOAD SUMS.
    Payloads are split into four 8-bit limbs so each limb's f32 matmul
    accumulation stays exact (limb sums < 2^24 while per-slot
    multiplicity < ~65k — planner-guarded); the limbs recombine with
    int32 shifts, wrapping mod 2^32 exactly like the reference's
    unsigned checksum accumulators.
    """
    sl_rows = geom.sl_rows
    c_rows = geom.c_rows
    ch = geom.ch_per_step
    ngroups = geom.ngroups
    nchunks = geom.nchunks
    nt = geom.ntiles
    gnt = ngroups * nt
    lo = geom.lo
    shift = geom.shift

    def kern(row_d, own_d, rk_ref, rp_ref, cnt_out, pay_out,
             kbuf, pbuf, sem, acc_c, acc_p0, acc_p1, acc_p2, acc_p3):
        g = pl.program_id(0)
        b = g // gnt
        gi = (g // nt) - b * ngroups
        step_in_b = g - b * gnt

        @pl.when(step_in_b == 0)
        def _():
            acc_c[:] = jnp.zeros_like(acc_c)
            acc_p0[:] = jnp.zeros_like(acc_p0)
            acc_p1[:] = jnp.zeros_like(acc_p1)
            acc_p2[:] = jnp.zeros_like(acc_p2)
            acc_p3[:] = jnp.zeros_like(acc_p3)

        nlive = jnp.minimum(nchunks - gi * ch, ch)
        for t in range(ch):
            @pl.when(t < nlive)
            def _():
                pltpu.make_async_copy(
                    rk_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    kbuf.at[pl.ds(t * c_rows, c_rows), :], sem).start()
                pltpu.make_async_copy(
                    rp_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    pbuf.at[pl.ds(t * c_rows, c_rows), :], sem).start()
        for t in range(ch):
            @pl.when(t < nlive)
            def _():
                pltpu.make_async_copy(
                    rk_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    kbuf.at[pl.ds(t * c_rows, c_rows), :], sem).wait()
                pltpu.make_async_copy(
                    rp_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    pbuf.at[pl.ds(t * c_rows, c_rows), :], sem).wait()

        live_rows = nlive * c_rows
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (sl_rows, LANES), 0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        dn = (((1,), (1,)), ((), ()))

        def sub(u, _):
            t = u // (c_rows // 8)
            r = pl.multiple_of(u * 8, 8)
            k = kbuf[pl.ds(r, 8), :]
            p = pbuf[pl.ds(r, 8), :]
            norm = k - jnp.int32(lo)
            abs_row = row_d[0, 0, t] + (r - t * c_rows) + row_iota
            owned = (abs_row >= own_d[0, 0, t]) \
                & (abs_row < own_d[0, 0, t] + c_rows)
            ok = ((norm >> shift) == b) & owned
            local = norm & ((1 << shift) - 1)
            lane = local & (LANES - 1)
            rowj = local >> 7
            okf = ok.astype(jnp.bfloat16)
            limbs = [(((p >> (8 * q)) & 255).astype(jnp.bfloat16) * okf)
                     for q in range(4)]
            for i in range(8):
                mJ = (iota_j == rowj[i:i + 1, :]).astype(jnp.bfloat16)
                C = (iota_l == lane[i:i + 1, :]).astype(jnp.bfloat16)
                acc_c[:] += jax.lax.dot_general(
                    mJ * okf[i:i + 1, :], C, dn,
                    preferred_element_type=jnp.float32)
                for acc, lim in zip((acc_p0, acc_p1, acc_p2, acc_p3),
                                    limbs):
                    acc[:] += jax.lax.dot_general(
                        mJ * lim[i:i + 1, :], C, dn,
                        preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, live_rows // 8, sub, 0)

        @pl.when(step_in_b == gnt - 1)
        def _():
            cnt_out[:] = acc_c[:].astype(jnp.int32)
            pay = acc_p0[:].astype(jnp.int32)
            pay += acc_p1[:].astype(jnp.int32) << 8
            pay += acc_p2[:].astype(jnp.int32) << 16
            pay += acc_p3[:].astype(jnp.int32) << 24
            pay_out[:] = pay
    return kern


def build_tables_pallas(rk_part, rp_part, row_d, own_d,
                        geom: bitmap_join.ProbeGeom,
                        interpret: bool = False):
    """(count, paysum) tables from partitioned R: (F*sl_rows, 128) each."""
    G = geom.grid
    gnt = geom.ngroups * geom.ntiles
    F = 1 << geom.part_bits
    smem_desc = pl.BlockSpec((1, 1, geom.ch_per_step), lambda g: (g, 0, 0),
                             memory_space=pltpu.SMEM)
    out_blk = pl.BlockSpec((geom.sl_rows, LANES),
                           lambda g, gnt=gnt: (g // gnt, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _build_kernel_for(geom),
        grid=(G,),
        in_specs=[
            smem_desc, smem_desc,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_blk, out_blk),
        out_shape=(
            jax.ShapeDtypeStruct((F * geom.sl_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((F * geom.sl_rows, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((geom.ch_per_step * geom.c_rows, LANES), jnp.int32),
            pltpu.VMEM((geom.ch_per_step * geom.c_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ] + [pltpu.VMEM((geom.sl_rows, LANES), jnp.float32)
             for _ in range(5)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=bitmap_join.VMEM_LIMIT),
    )(row_d, own_d, rk_part, rp_part)


def plan_tables_build(r_key, r_pay, lo: int, hi: int, part_bits: int,
                      shift: int, slice_rows: int, interpret: bool = False,
                      chunk_rows: int = bitmap_join.CHUNK_ROWS):
    """Pallas count/paysum build plan: (build_from, rk_in, rp_in, bgeom)."""
    pgeom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=part_bits,
                                lo=lo, hi=hi, shift=shift)
    chunk = chunk_rows * LANES
    rk_in = radix_ops._chunk_pad(r_key, chunk)
    rp_in = radix_ops._chunk_pad(r_pay, chunk)
    nchunks = rk_in.shape[0] // chunk
    _, _, rstarts = jax.jit(lambda k, p: radix_ops.partition_pass_kv(
        k, p, interpret=interpret, geom=pgeom))(rk_in, rp_in)
    F = 1 << part_bits
    st = np.asarray(rstarts).reshape(nchunks, -1)[:, :F + 1].astype(np.int64)
    max_run = int((st[:, 1:] - st[:, :-1]).max()) if nchunks else 1
    bgeom = bitmap_join._probe_geom(part_bits, shift, slice_rows, lo,
                                    chunk_rows, nchunks, max_run)

    def build_from(rk, rp, chain):
        rkp, rpp, rst = radix_ops.partition_pass_kv(
            rk + chain * 0, rp, interpret=interpret, geom=pgeom)
        rd, od = bitmap_join.derive_descs(
            rst.reshape(nchunks, -1, LANES), bgeom)
        return build_tables_pallas(rkp, rpp, rd, od, bgeom,
                                   interpret=interpret)

    return build_from, rk_in, rp_in, bgeom


def _probe_kernel_for(geom: bitmap_join.ProbeGeom, with_spay: bool = True):
    sl_rows = geom.sl_rows            # slice rows (words per 128 lanes)
    c_rows = geom.c_rows
    ch = geom.ch_per_step
    ngroups = geom.ngroups
    nchunks = geom.nchunks
    nt = geom.ntiles
    lo = geom.lo
    shift = geom.shift
    local_mask = (1 << shift) - 1

    def kern(row_d, own_d, cnt_ref, pay_ref, *rest):
        if with_spay:
            (s_ref, sp_ref, out_c, out_r, out_s,
             sbuf, pbuf, sem, accc, accr, accs) = rest
        else:
            (s_ref, out_c, out_r, out_s,
             sbuf, sem, accc, accr) = rest
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        b = g // (ngroups * nt)
        gi = (g // nt) - b * ngroups

        @pl.when(g == 0)
        def _():
            accc[:] = jnp.zeros_like(accc)
            accr[:] = jnp.zeros_like(accr)
            if with_spay:
                accs[:] = jnp.zeros_like(accs)

        nlive = jnp.minimum(nchunks - gi * ch, ch)
        for t in range(ch):
            @pl.when(t < nlive)
            def _():
                pltpu.make_async_copy(
                    s_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    sbuf.at[pl.ds(t * c_rows, c_rows), :], sem).start()
                if with_spay:
                    pltpu.make_async_copy(
                        sp_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                        pbuf.at[pl.ds(t * c_rows, c_rows), :], sem).start()
        for t in range(ch):
            @pl.when(t < nlive)
            def _():
                pltpu.make_async_copy(
                    s_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    sbuf.at[pl.ds(t * c_rows, c_rows), :], sem).wait()
                if with_spay:
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
            if with_spay:
                sp = pbuf[pl.ds(r, 8), :]
                accs[:] += sp * cv           # mod 2^32
            return 0

        jax.lax.fori_loop(0, live_rows // 8, sub, 0)

        @pl.when(g == ng - 1)
        def _():
            out_c[0, 0] = jnp.sum(accc[:])
            out_r[0, 0] = jnp.sum(accr[:])
            out_s[0, 0] = jnp.sum(accs[:]) if with_spay else 0
    return kern


def probe_count_sums(cnt_tbl, pay_tbl, s_part, sp_part, row_d, own_d,
                     geom: bitmap_join.ProbeGeom, interpret: bool = False):
    """Probe with S payloads routed: (count, r_checksum, s_checksum)."""
    gnt = geom.ngroups * geom.ntiles
    blk_slice = pl.BlockSpec(
        (geom.sl_rows, LANES),
        lambda g, gnt=gnt: (g // gnt, 0),
        memory_space=pltpu.VMEM)
    smem_desc = pl.BlockSpec((1, 1, geom.ch_per_step), lambda g: (g, 0, 0),
                             memory_space=pltpu.SMEM)
    with_spay = sp_part is not None
    in_specs = [smem_desc, smem_desc, blk_slice, blk_slice,
                pl.BlockSpec(memory_space=pl.ANY)]
    args = [row_d, own_d, cnt_tbl, pay_tbl, s_part]
    scratch = [pltpu.VMEM((geom.ch_per_step * geom.c_rows, LANES),
                          jnp.int32)]
    if with_spay:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(sp_part)
        scratch.append(pltpu.VMEM((geom.ch_per_step * geom.c_rows, LANES),
                                  jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA)
    scratch += [pltpu.VMEM((8, LANES), jnp.int32)
                for _ in range(3 if with_spay else 2)]
    outs = pl.pallas_call(
        _probe_kernel_for(geom, with_spay=with_spay),
        grid=(geom.grid,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.SMEM)
                        for _ in range(3)),
        out_shape=tuple(jax.ShapeDtypeStruct((1, 1), jnp.int32)
                        for _ in range(3)),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=bitmap_join.VMEM_LIMIT),
    )(*args)
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
    full_fn: "callable" = None  # chain -> (count, sums) incl. R build
    build_scalar_fn: "callable" = None
    chain_fn: "callable" = None  # reps -> count of last chained full run

    def count3(self, chain=0, full: bool = False):
        fn = self.full_fn if (full and self.full_fn is not None) \
            else self.count_fn
        c, r, s = fn(jnp.int32(chain))
        return int(c), int(np.uint32(int(r) & 0xFFFFFFFF)), int(
            np.uint32(int(s) & 0xFFFFFFFF))

    chained_count = bitmap_join.RadixJoinPlan.chained_count
    _time = bitmap_join.RadixJoinPlan._time
    time_partition = bitmap_join.RadixJoinPlan.time_partition
    time_probe = bitmap_join.RadixJoinPlan.time_probe
    time_build = bitmap_join.RadixJoinPlan.time_build


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

    # R-side build: Pallas partition + MXU count/paysum deposit
    build_from, rk_in, rp_in, _ = plan_tables_build(
        r_key, r_pay, lo, hi, part_bits, shift, slice_rows,
        interpret=interpret, chunk_rows=chunk_rows)
    build_jit = jax.jit(build_from)
    build_scalar = jax.jit(
        lambda rk, rp, chain: build_from(rk, rp, chain)[0][-1, -1]
        + chain * 0)
    t0 = time.perf_counter()
    cnt_tbl, pay_tbl = jax.block_until_ready(
        build_jit(rk_in, rp_in, jnp.int32(0)))
    build_wall = (time.perf_counter() - t0) * 1e6
    # exactness guard: the 8-bit-limb f32 deposit is exact while per-slot
    # multiplicity keeps limb sums < 2^24 (one plan-time sync)
    if int(jax.jit(jnp.max)(cnt_tbl)) >= 65000:
        return None
    if interpret:
        build_usec = max(build_wall, 1.0)
        build_scalar_fn = None
    else:
        floor = bitmap_join.dispatch_floor_usec()
        int(build_scalar(rk_in, rp_in, jnp.int32(1)))
        t0 = time.perf_counter()
        int(build_scalar(rk_in, rp_in, jnp.int32(2)))
        raw = (time.perf_counter() - t0) * 1e6
        build_usec = max(raw - floor, 0.2 * raw)
        build_scalar_fn = (lambda rk=rk_in, rp=rp_in:
                           (lambda c: build_scalar(rk, rp, c)))()

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

    # tables ride as jit ARGUMENTS (closure capture inlines them as HLO
    # constants — 1 GiB at workload-B range, past the compile size limit)
    def count_from(ct, pt, sk, sp, chain):
        s2, p2, stt = part(sk, sp, chain)
        rd, od = bitmap_join.derive_descs(stt.reshape(nchunks, -1, LANES),
                                          geom)
        return probe_count_sums(ct, pt, s2, p2, rd, od, geom,
                                interpret=interpret)

    def full_from(rk, rp, sk, sp, chain):
        ct, pt = build_from(rk, rp, chain)
        s2, p2, stt = part(sk, sp, chain)
        rd, od = bitmap_join.derive_descs(stt.reshape(nchunks, -1, LANES),
                                          geom)
        return probe_count_sums(ct, pt, s2, p2, rd, od, geom,
                                interpret=interpret)

    count_jit = jax.jit(count_from)
    full_jit = jax.jit(full_from)

    def chain_from(rk, rp, sk, sp, reps):
        def body(i, acc):
            return full_from(rk, rp, sk, sp, i + acc * 0)[0]
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    chain_jit = jax.jit(chain_from)
    jax.block_until_ready(full_jit(rk_in, rp_in, sk_in, sp_in, jnp.int32(0)))
    jax.block_until_ready(count_jit(cnt_tbl, pay_tbl, sk_in, sp_in,
                                    jnp.int32(0)))
    rd0 = jax.jit(lambda s: bitmap_join.derive_descs(
        s.reshape(nchunks, -1, LANES), geom))(starts)
    # big arrays ride as jit ARGUMENTS, never closures: a closed-over
    # device array is inlined as an HLO constant and the serialized
    # program blows the remote compiler's request limit at production S
    probe_jit = jax.jit(lambda ct, pt, s2, p2, rd, od, chain:
                        probe_count_sums(ct, pt, s2, p2 + chain * 0,
                                         rd, od, geom,
                                         interpret=interpret)[0])
    part_scalar = jax.jit(lambda sk, sp, chain: part(
        sk, sp, chain)[0].ravel()[-1].astype(jnp.int32))

    return PrhoPlan(
        count_fn=lambda c: count_jit(cnt_tbl, pay_tbl, sk_in, sp_in, c),
        part_fn=lambda c: part_scalar(sk_in, sp_in, c),
        probe_fn=lambda c: probe_jit(cnt_tbl, pay_tbl, s_part, sp_part,
                                     rd0[0], rd0[1], c),
        s_tuples=int(s_key.shape[0]),
        build_usec=build_usec, geom=geom,
        full_fn=lambda c: full_jit(rk_in, rp_in, sk_in, sp_in, c),
        build_scalar_fn=build_scalar_fn,
        chain_fn=lambda n: chain_jit(rk_in, rp_in, sk_in, sp_in, n))


def plan_prh_join(r_key, r_pay, s_key, lo: int, hi: int,
                  interpret: bool = False,
                  chunk_rows: int = bitmap_join.CHUNK_ROWS,
                  num_radix_bits: Optional[int] = None):
    """PRH plan: histogram re-order join, keys-only probe side.

    The reference's PRH (histogram_join, parallel_radix_join.c:347-436)
    re-orders each partition via a histogram then probes with a scalar
    loop; PRHO is the same layout with a SIMD probe.  On TPU both probes
    become the same vectorized gather ladder (SURVEY §7 step 5 predicts
    the collapse), so PRH shares PRHO's count/paysum-table engine but
    routes ONLY keys through the S partition (the reference's PRH moves
    whole tuples, but its TPU cost profile is keys-only: the probe needs
    no S payload because the S checksum is not accumulated on this tier).
    Returns (count, r_checksum, 0).  Non-unique R supported.
    """
    if interpret:
        chunk_rows = min(chunk_rows, 1024)
    part_bits, shift, slice_rows = plan_geometry_counts(lo, hi,
                                                        num_radix_bits)
    pgeom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=part_bits,
                                lo=lo, hi=hi, shift=shift)
    chunk = chunk_rows * LANES

    build_from, rk_in, rp_in, _ = plan_tables_build(
        r_key, r_pay, lo, hi, part_bits, shift, slice_rows,
        interpret=interpret, chunk_rows=chunk_rows)
    build_jit = jax.jit(build_from)
    build_scalar = jax.jit(
        lambda rk, rp, chain: build_from(rk, rp, chain)[0][-1, -1]
        + chain * 0)
    t0 = time.perf_counter()
    cnt_tbl, pay_tbl = jax.block_until_ready(
        build_jit(rk_in, rp_in, jnp.int32(0)))
    build_wall = (time.perf_counter() - t0) * 1e6
    if int(jax.jit(jnp.max)(cnt_tbl)) >= 65000:
        return None
    if interpret:
        build_usec = max(build_wall, 1.0)
        build_scalar_fn = None
    else:
        floor = bitmap_join.dispatch_floor_usec()
        int(build_scalar(rk_in, rp_in, jnp.int32(1)))
        t0 = time.perf_counter()
        int(build_scalar(rk_in, rp_in, jnp.int32(2)))
        raw = (time.perf_counter() - t0) * 1e6
        build_usec = max(raw - floor, 0.2 * raw)
        build_scalar_fn = (lambda rk=rk_in, rp=rp_in:
                           (lambda c: build_scalar(rk, rp, c)))()

    part = jax.jit(lambda sk, chain: radix_ops.partition_pass(
        sk + chain * 0, interpret=interpret, geom=pgeom))
    sk_in = radix_ops._chunk_pad(s_key, chunk)
    nchunks = sk_in.shape[0] // chunk
    s_part, starts = part(sk_in, jnp.int32(0))

    F = 1 << part_bits
    st = np.asarray(starts).reshape(nchunks, -1)[:, :F + 1].astype(np.int64)
    max_run = int((st[:, 1:] - st[:, :-1]).max()) if nchunks else 1
    geom = bitmap_join._probe_geom(part_bits, shift, slice_rows, lo,
                                   chunk_rows, nchunks, max_run)

    # tables as jit ARGUMENTS (closure capture would inline 1 GiB of HLO
    # constants at workload-B range — past the compile payload limit)
    def count_from(ct, pt, sk, chain):
        s2, stt = part(sk, chain)
        rd, od = bitmap_join.derive_descs(stt.reshape(nchunks, -1, LANES),
                                          geom)
        return probe_count_sums(ct, pt, s2, None, rd, od, geom,
                                interpret=interpret)

    def full_from(rk, rp, sk, chain):
        ct, pt = build_from(rk, rp, chain)
        s2, stt = part(sk, chain)
        rd, od = bitmap_join.derive_descs(stt.reshape(nchunks, -1, LANES),
                                          geom)
        return probe_count_sums(ct, pt, s2, None, rd, od, geom,
                                interpret=interpret)

    count_jit = jax.jit(count_from)
    full_jit = jax.jit(full_from)

    def chain_from(rk, rp, sk, reps):
        def body(i, acc):
            return full_from(rk, rp, sk, i + acc * 0)[0]
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    chain_jit = jax.jit(chain_from)
    jax.block_until_ready(full_jit(rk_in, rp_in, sk_in, jnp.int32(0)))
    jax.block_until_ready(count_jit(cnt_tbl, pay_tbl, sk_in, jnp.int32(0)))
    rd0 = jax.jit(lambda s: bitmap_join.derive_descs(
        s.reshape(nchunks, -1, LANES), geom))(starts)
    probe_jit = jax.jit(lambda ct, pt, s2, rd, od, chain:
                        probe_count_sums(ct, pt, s2 + chain * 0, None,
                                         rd, od, geom,
                                         interpret=interpret)[0])
    part_scalar = jax.jit(lambda sk, chain: part(
        sk, chain)[0].ravel()[-1].astype(jnp.int32))

    return PrhoPlan(
        count_fn=lambda c: count_jit(cnt_tbl, pay_tbl, sk_in, c),
        part_fn=lambda c: part_scalar(sk_in, c),
        probe_fn=lambda c: probe_jit(cnt_tbl, pay_tbl, s_part,
                                     rd0[0], rd0[1], c),
        s_tuples=int(s_key.shape[0]),
        build_usec=build_usec, geom=geom,
        full_fn=lambda c: full_jit(rk_in, rp_in, sk_in, c),
        build_scalar_fn=build_scalar_fn,
        chain_fn=lambda n: chain_jit(rk_in, rp_in, sk_in, n))


def _materialize_kernel_for(geom: bitmap_join.ProbeGeom):
    """Result materialization probe: emit (r_pay, s_pay, key) per match.

    The reference's JOIN_RESULT_MATERIALIZE appends rid pairs to chained
    per-thread buffers (tuple_buffer.h:92-108); the deterministic TPU
    formulation emits into a staged-order output image instead: each grid
    step owns an output block congruent to its staging buffer, matched
    slots carry the pair, unmatched slots carry PAD.  Downstream
    consumers (Out.tbl writer, JoinResult) drop PAD slots — order is not
    part of the contract (the reference's buffer order is thread-
    scheduling-dependent too).  Requires unique R (count slices in
    {0,1}); the registry guards and falls back otherwise.
    """
    sl_rows = geom.sl_rows
    c_rows = geom.c_rows
    ch = geom.ch_per_step
    ngroups = geom.ngroups
    nchunks = geom.nchunks
    nt = geom.ntiles
    lo = geom.lo
    shift = geom.shift
    local_mask = (1 << shift) - 1

    def kern(row_d, own_d, cnt_ref, pay_ref, s_ref, sp_ref,
             out_r, out_s, out_k, out_c, sbuf, pbuf, sem, accc):
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        b = g // (ngroups * nt)
        gi = (g // nt) - b * ngroups

        @pl.when(g == 0)
        def _():
            accc[:] = jnp.zeros_like(accc)

        nlive = jnp.minimum(nchunks - gi * ch, ch)
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
        PAD = jnp.int32(PAD_KEY)

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
            m = ok & (cv > 0)
            out_r[pl.ds(r, 8), :] = jnp.where(m, pv, PAD)
            out_s[pl.ds(r, 8), :] = jnp.where(m, sp, PAD)
            out_k[pl.ds(r, 8), :] = jnp.where(m, k, PAD)
            accc[:] += m.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, live_rows // 8, sub, 0)
        # slack rows beyond the live windows must read as PAD
        @pl.when(live_rows < ch * c_rows)
        def _():
            def padrow(u, _):
                r = pl.multiple_of(u * 8, 8)
                @pl.when(u * 8 >= live_rows)
                def _():
                    out_r[pl.ds(r, 8), :] = jnp.full((8, LANES), PAD)
                    out_s[pl.ds(r, 8), :] = jnp.full((8, LANES), PAD)
                    out_k[pl.ds(r, 8), :] = jnp.full((8, LANES), PAD)
                return 0
            jax.lax.fori_loop(0, (ch * c_rows) // 8, padrow, 0)

        @pl.when(g == ng - 1)
        def _():
            out_c[0, 0] = jnp.sum(accc[:])
    return kern


def materialize_pairs(cnt_tbl, pay_tbl, s_part, sp_part, row_d, own_d,
                      geom: bitmap_join.ProbeGeom, interpret: bool = False):
    """Emit matched pairs in staged-order image: (out_r, out_s, out_k, n).

    Output arrays have geom.grid * ch_per_step * c_rows rows; PAD-slot
    entries are non-matches/slack.
    """
    gnt = geom.ngroups * geom.ntiles
    blk_slice = pl.BlockSpec(
        (geom.sl_rows, LANES),
        lambda g, gnt=gnt: (g // gnt, 0),
        memory_space=pltpu.VMEM)
    smem_desc = pl.BlockSpec((1, 1, geom.ch_per_step), lambda g: (g, 0, 0),
                             memory_space=pltpu.SMEM)
    step_rows = geom.ch_per_step * geom.c_rows
    out_blk = pl.BlockSpec((step_rows, LANES), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    G = geom.grid
    outs = pl.pallas_call(
        _materialize_kernel_for(geom),
        grid=(G,),
        in_specs=[smem_desc, smem_desc, blk_slice, blk_slice,
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_blk, out_blk, out_blk,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((G * step_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G * step_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G * step_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((geom.ch_per_step * geom.c_rows, LANES), jnp.int32),
            pltpu.VMEM((geom.ch_per_step * geom.c_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=bitmap_join.VMEM_LIMIT),
    )(row_d, own_d, cnt_tbl, pay_tbl, s_part, sp_part)
    return outs


def plan_materialize_join(r_key, r_pay, s_key, s_pay, lo: int, hi: int,
                          interpret: bool = False,
                          chunk_rows: int = bitmap_join.CHUNK_ROWS,
                          num_radix_bits: Optional[int] = None):
    """Pallas materialization plan (unique R): returns (fn, meta) or None.

    fn(chain) -> (out_r, out_s, out_k, count) — the full pipeline (table
    build + kv partition + pair-emitting probe) as one device program.
    None when R is non-unique at any slot (pairs would need per-key R
    tuple lists; the XLA sort tier serves that) or on window overflow.
    """
    if interpret:
        chunk_rows = min(chunk_rows, 1024)
    part_bits, shift, slice_rows = plan_geometry_counts(lo, hi,
                                                        num_radix_bits)
    pgeom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=part_bits,
                                lo=lo, hi=hi, shift=shift)
    chunk = chunk_rows * LANES

    build_from, rk_in, rp_in, _ = plan_tables_build(
        r_key, r_pay, lo, hi, part_bits, shift, slice_rows,
        interpret=interpret, chunk_rows=chunk_rows)
    cnt_tbl, pay_tbl = jax.jit(build_from)(rk_in, rp_in, jnp.int32(0))
    if int(jax.jit(jnp.max)(cnt_tbl)) > 1:
        return None                       # non-unique R: XLA tier serves it

    part = jax.jit(lambda sk, sp, chain: radix_ops.partition_pass_kv(
        sk + chain * 0, sp, interpret=interpret, geom=pgeom))
    sk_in = radix_ops._chunk_pad(s_key, chunk)
    sp_in = radix_ops._chunk_pad(s_pay, chunk)
    nchunks = sk_in.shape[0] // chunk
    _, _, starts = part(sk_in, sp_in, jnp.int32(0))
    F = 1 << part_bits
    st = np.asarray(starts).reshape(nchunks, -1)[:, :F + 1].astype(np.int64)
    max_run = int((st[:, 1:] - st[:, :-1]).max()) if nchunks else 1
    geom = bitmap_join._probe_geom(part_bits, shift, slice_rows, lo,
                                   chunk_rows, nchunks, max_run)
    if geom.ch_per_step > 1:
        geom = dataclasses.replace(
            geom, ch_per_step=max(1, geom.ch_per_step // 2),
            ngroups=-(-nchunks // max(1, geom.ch_per_step // 2)))

    def run(ct, pt, sk, sp, chain):
        s2, p2, stt = part(sk, sp, chain)
        rd, od = bitmap_join.derive_descs(stt.reshape(nchunks, -1, LANES),
                                          geom)
        return materialize_pairs(ct, pt, s2, p2, rd, od, geom,
                                 interpret=interpret)

    run_jit = jax.jit(run)
    return (lambda c: run_jit(cnt_tbl, pay_tbl, sk_in, sp_in, c)), geom
