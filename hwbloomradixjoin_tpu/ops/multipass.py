"""Two-pass radix partitioning: chunk-major pass 1 + contiguous pass 2.

The reference's defining structure (parallel_radix_join.c: pass 1 =
parallel_radix_partition :735 over the high bits, pass 2 =
serial_radix_partition :680 re-clustering each pass-1 partition by the next
bits, bounded fan-out per pass per prj_params.h:15-22).  The TPU mapping:

- Pass 1: `partition_pass` by the HIGH b1 bits — chunk-major bucket-grouped
  output + per-chunk starts (ops/radix.py).
- Pass 2: one grid step per pass-1 bucket.  The step DMA-gathers every
  chunk's run of that bucket into a VMEM staging buffer (windows from the
  pass-1 starts, exactly the probe's gather pattern), masks out window
  slack by recomputing the bucket from the key, sub-splits the buffer by
  the next b2 bits, and writes it to the bucket's capacity-padded region
  of a globally CONTIGUOUS bucket-major output — the property pass 2
  exists to establish (each final partition is one dense run, so the
  probe needs one descriptor per final bucket instead of one per
  (chunk, bucket)).
- Probe: the single-pass probe kernel is reused unchanged — the contiguous
  layout is expressed as tile-window descriptors over each final run.

When to use which: a single pass minimizes split work (the VPU split
network costs ~0.32 ns/elem/bit, measured — docs in ops/bitmap_join.py),
so 2 passes only pay off when the single-pass fan-out would make
(chunk, bucket) runs shorter than a DMA window (big key spans), or for the
reference's never-single-pass experiment (measurements/run.py).
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


@dataclasses.dataclass(frozen=True)
class Pass2Geom:
    b1: int               # pass-1 bits (high)
    b2: int               # pass-2 bits
    shift1: int
    shift2: int
    lo: int
    hi: int
    chunk_rows: int
    nchunks: int
    c1_rows: int          # pass-1 run DMA window rows
    cap_rows: int         # output region rows per pass-1 bucket
    cat2_rows: int        # rows of the pass-2 starts block
    # hash mode (bloom prune): categories come from the filter's block
    # index crc32c(seed, key) instead of the key value — the 2-pass
    # analogue of RadixGeom's hash mode (ops/radix.py)
    hash_seed: Optional[int] = None
    hash_bits: int = 0

    @property
    def gbuf_rows(self):
        return self.nchunks * self.c1_rows


def _pass2_kernel_for(geom: Pass2Geom):
    nchunks = geom.nchunks
    c1 = geom.c1_rows
    lo, shift1, shift2 = geom.lo, geom.shift1, geom.shift2
    F2 = 1 << geom.b2
    cap = geom.cap_rows

    def kern(row_d, s_ref, out_ref, starts_ref, gbuf, sem):
        b = pl.program_id(0)

        for t in range(nchunks):
            pltpu.make_async_copy(
                s_ref.at[pl.ds(row_d[0, 0, t], c1), :],
                gbuf.at[pl.ds(t * c1, c1), :], sem).start()
        for t in range(nchunks):
            pltpu.make_async_copy(
                s_ref.at[pl.ds(row_d[0, 0, t], c1), :],
                gbuf.at[pl.ds(t * c1, c1), :], sem).wait()

        key = gbuf[:]
        if geom.hash_seed is not None:
            from hwbloomradixjoin_tpu.ops import hashes
            block = (hashes.hash_crc(jnp.uint32(geom.hash_seed), key)
                     & jnp.uint32((1 << geom.hash_bits) - 1)
                     ).astype(jnp.int32)
            mine = (key != PAD_KEY) \
                & ((block >> (geom.hash_bits - geom.b1)) == b)
            sub = (block >> (geom.hash_bits - geom.b1 - geom.b2)) & (F2 - 1)
            cat = jnp.where(mine, sub, F2)
            cat_fn = None
        else:
            norm = key - jnp.int32(lo)
            mine = (norm >> shift1) == b       # window slack -> pad
            key = jnp.where(mine, key, jnp.int32(PAD_KEY))

            def cat_fn(k):
                n2 = k - jnp.int32(lo)
                sub = jax.lax.shift_right_logical(
                    n2.astype(jnp.uint32), jnp.uint32(shift2)
                ).astype(jnp.int32) & (F2 - 1)
                return jnp.where(k != PAD_KEY, sub, F2)
            cat = cat_fn(key)
        cat_s, (key_s,) = radix_ops.split_chunk(cat, [key], geom.b2 + 1,
                                                cat_fn=cat_fn)
        out_ref[:] = key_s[:cap]
        starts_ref[:] = radix_ops.sorted_starts_wide(cat_s, geom.cat2_rows)
    return kern


def pass2_partition(s_part1, row_d, geom: Pass2Geom, interpret: bool = False):
    """Regroup pass-1 output into contiguous bucket-major regions.

    Returns (s_part2 (F1*cap_rows, 128), starts2 (F1*cat2_rows, 128)); the
    starts are flat offsets WITHIN the gather buffer, so run j of region b
    begins at flat position b*cap_rows*128 + starts2[b][j].
    """
    F1 = 1 << geom.b1
    return pl.pallas_call(
        _pass2_kernel_for(geom),
        grid=(F1,),
        in_specs=[
            pl.BlockSpec((1, 1, geom.nchunks), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((geom.cap_rows, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((geom.cat2_rows, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F1 * geom.cap_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((F1 * geom.cat2_rows, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((geom.gbuf_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=bitmap_join.VMEM_LIMIT),
    )(row_d, s_part1)


def derive_descs_contig(starts2, pgeom: bitmap_join.ProbeGeom,
                        geom: Pass2Geom):
    """(F1*cat2_rows,128) pass-2 starts -> probe tile descriptors.

    One (row, ownership-start) pair per (final bucket, tile): row = region
    base + clamp(start>>7) + tile*c_rows clamped inside the region; the
    ownership mask dedupes tiles, the fine-bucket check masks neighbor
    sub-runs and region padding.
    """
    F1, F2 = 1 << geom.b1, 1 << geom.b2
    ntiles, c_rows = pgeom.ntiles, pgeom.c_rows
    st = starts2.reshape(F1, -1)[:, :F2]              # (F1, F2) flat starts
    base = jnp.arange(F1, dtype=jnp.int32)[:, None] * geom.cap_rows
    r0 = base + (st >> 7)
    tile = jnp.arange(ntiles, dtype=jnp.int32)
    own = r0.reshape(F1 * F2, 1) + tile[None, :] * c_rows
    hi_row = (base + geom.cap_rows - c_rows).repeat(F2, 0).reshape(-1, 1)
    row = jnp.minimum(own, hi_row)
    shape = (F1 * F2 * ntiles, 1, 1)
    return row.reshape(shape), own.reshape(shape)


@dataclasses.dataclass
class TwoPassPlan:
    count_fn: "callable"
    part_fn: "callable"
    probe_fn: "callable"
    s_tuples: int
    build_usec: float
    geom: bitmap_join.ProbeGeom
    pass2: Pass2Geom
    full_fn: "callable" = None
    build_scalar_fn: "callable" = None
    chain_fn: "callable" = None

    count = bitmap_join.RadixJoinPlan.count
    full_count = bitmap_join.RadixJoinPlan.full_count
    chained_count = bitmap_join.RadixJoinPlan.chained_count
    _time = bitmap_join.RadixJoinPlan._time
    time_partition = bitmap_join.RadixJoinPlan.time_partition
    time_probe = bitmap_join.RadixJoinPlan.time_probe
    time_build = bitmap_join.RadixJoinPlan.time_build


def plan_radix_join_2pass(r_key, s_key, lo: int, hi: int,
                          interpret: bool = False,
                          chunk_rows: int = bitmap_join.CHUNK_ROWS,
                          num_radix_bits: Optional[int] = None):
    """2-pass plan: partition by high bits, regroup contiguous, probe.

    Same contract as plan_radix_join (unique R in [lo, hi]); returns None
    on staging overflow (heavy skew) or when the bit budget cannot be
    split (part_bits < 2 forces a single pass anyway).
    """
    if interpret:
        chunk_rows = min(chunk_rows, 1024)
    part_bits, shift, sl_rows = bitmap_join.plan_geometry(lo, hi,
                                                          num_radix_bits)
    if part_bits < 2:
        return None
    b2 = part_bits // 2
    b1 = part_bits - b2
    shift1 = shift + b2
    p1geom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=b1,
                                 lo=lo, hi=hi, shift=shift1)
    chunk = chunk_rows * LANES

    # R-side build: same Pallas partition + MXU deposit engine as the
    # single-pass plan (bitmap_join.plan_bitmap_build)
    build_from, rk_in, _ = bitmap_join.plan_bitmap_build(
        r_key, lo, hi, part_bits, shift, sl_rows, interpret=interpret,
        chunk_rows=chunk_rows)
    build_jit = jax.jit(build_from)
    build_scalar = jax.jit(
        lambda rk, chain: build_from(rk, chain)[-1, -1] + chain * 0)
    t0 = time.perf_counter()
    bitmap = jax.block_until_ready(build_jit(rk_in, jnp.int32(0)))
    if interpret:
        build_usec = max((time.perf_counter() - t0) * 1e6, 1.0)
        build_scalar_fn = None
    else:
        floor = bitmap_join.dispatch_floor_usec()
        int(build_scalar(rk_in, jnp.int32(1)))
        t0 = time.perf_counter()
        int(build_scalar(rk_in, jnp.int32(2)))
        raw = (time.perf_counter() - t0) * 1e6
        build_usec = max(raw - floor, 0.2 * raw)
        build_scalar_fn = lambda c: build_scalar(rk_in, c)

    part1 = jax.jit(lambda sk, chain: radix_ops.partition_pass(
        sk + chain * 0, interpret=interpret, geom=p1geom))
    sk_in = radix_ops._chunk_pad(s_key, chunk)
    nchunks = sk_in.shape[0] // chunk
    sp1, starts1 = part1(sk_in, jnp.int32(0))

    F1, F2 = 1 << b1, 1 << b2
    st = np.asarray(starts1).reshape(nchunks, -1)[:, :F1 + 1].astype(np.int64)
    runs1 = st[:, 1:] - st[:, :-1]
    c1_rows = (int(-(-runs1.max() // LANES)) + 1 + 7) & ~7
    if c1_rows > chunk_rows:
        # a pass-1 bucket (nearly) fills a whole chunk: _descs1's window
        # clamp would go negative and gather rows outside the chunk —
        # fall back to the 1-pass engine, whose ownership-masked tiles
        # handle heavy runs (the SKEW_HANDLING bail-out analogue)
        return None
    if nchunks * c1_rows > 8 * bitmap_join.SBUF_BUDGET_ROWS or nchunks > 512:
        return None                                   # gather buffer too big
    cap_rows = (int(-(-(runs1.sum(0).max() + nchunks * LANES) // LANES))
                + 7) & ~7
    cap_rows = min(cap_rows, nchunks * c1_rows)   # never exceeds the gather
    cr2 = ((F2 + 1 + LANES - 1) // LANES + 7) & ~7
    p2 = Pass2Geom(b1=b1, b2=b2, shift1=shift1, shift2=shift, lo=lo, hi=hi,
                   chunk_rows=chunk_rows, nchunks=nchunks, c1_rows=c1_rows,
                   cap_rows=cap_rows, cat2_rows=cr2)

    # probe geometry over the contiguous layout: tiles instead of chunks
    sp2, starts2 = jax.jit(lambda s1, st1: pass2_partition(
        s1, _descs1(st1, p2), p2, interpret=interpret))(sp1, starts1)
    st2 = np.asarray(starts2).reshape(F1, -1)[:, :F2 + 1].astype(np.int64)
    run2_max = int((st2[:, 1:] - st2[:, :-1]).max())
    run2_rows = int(-(-run2_max // LANES)) + 1
    c_rows = min((run2_rows + 7) & ~7, cap_rows, bitmap_join.C_ROWS_CAP)
    ntiles = max(1, -(-run2_rows // c_rows))
    pgeom = bitmap_join.ProbeGeom(
        part_bits=part_bits, shift=shift, sl_rows=sl_rows, lo=lo,
        chunk_rows=cap_rows, nchunks=1, c_rows=c_rows,
        ch_per_step=1, ngroups=1, ntiles=ntiles)

    def count_from(sk, chain):
        s1, st1 = part1(sk, chain)
        s2, st2d = pass2_partition(s1, _descs1(st1, p2), p2,
                                   interpret=interpret)
        rd, od = derive_descs_contig(st2d, pgeom, p2)
        return bitmap_join.bitmap_probe_count(bitmap, s2, rd, od, pgeom,
                                              interpret=interpret)

    def full_from(rk, sk, chain):
        bm = build_from(rk, chain)
        s1, st1 = part1(sk, chain)
        s2, st2d = pass2_partition(s1, _descs1(st1, p2), p2,
                                   interpret=interpret)
        rd, od = derive_descs_contig(st2d, pgeom, p2)
        return bitmap_join.bitmap_probe_count(bm, s2, rd, od, pgeom,
                                              interpret=interpret)

    count_jit = jax.jit(count_from)
    full_jit = jax.jit(full_from)

    def chain_from(rk, sk, reps):
        def body(i, acc):
            return full_from(rk, sk, i + acc * 0)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    chain_jit = jax.jit(chain_from)
    int(full_jit(rk_in, sk_in, jnp.int32(0)))
    int(count_jit(sk_in, jnp.int32(0)))
    rd0 = jax.jit(lambda s: derive_descs_contig(s, pgeom, p2))(starts2)
    probe_jit = jax.jit(lambda sp, rd, chain: bitmap_join.bitmap_probe_count(
        bitmap, sp + chain * 0, rd[0], rd[1], pgeom, interpret=interpret))
    part_scalar = jax.jit(lambda sk, chain: pass2_partition(
        part1(sk, chain)[0], _descs1(part1(sk, chain)[1], p2), p2,
        interpret=interpret)[0].ravel()[-1].astype(jnp.int32))

    return TwoPassPlan(
        count_fn=lambda c: count_jit(sk_in, c),
        part_fn=lambda c: part_scalar(sk_in, c),
        probe_fn=lambda c: probe_jit(sp2, rd0, c),
        s_tuples=int(s_key.shape[0]),
        build_usec=build_usec, geom=pgeom, pass2=p2,
        full_fn=lambda c: full_jit(rk_in, sk_in, c),
        build_scalar_fn=build_scalar_fn,
        chain_fn=lambda n: chain_jit(rk_in, sk_in, n))


def _descs1(starts1, geom: Pass2Geom):
    """Pass-1 starts -> pass-2 gather window rows, (F1, 1, nchunks)."""
    F1 = 1 << geom.b1
    st = starts1.reshape(geom.nchunks, -1)[:, :F1]
    r0 = jnp.minimum(st >> 7, geom.chunk_rows - geom.c1_rows)
    row = (jnp.arange(geom.nchunks, dtype=jnp.int32)[:, None]
           * geom.chunk_rows + r0)
    return row.T.reshape(F1, 1, geom.nchunks)
