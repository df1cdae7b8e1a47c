"""Pallas blocked-bloom probe: VMEM-resident filter slices, fused pruning.

The thesis's core hardware-conscious idea is the BLOCKED filter: confine
each key's k probes to one cacheline-sized block so the filter check costs
one memory access (bloom_filter.c:125-141), and fuse the check into S's
pass-1 partitioning so pruned tuples never move again
(parallel_radix_join_bloom.c:798-849).  The TPU re-derivation:

- S is radix-partitioned by the TOP bits of the filter BLOCK INDEX
  (crc32c(seed, key), the reference's block selector) — the hash-space
  analogue of the key-space partition, run on the same Pallas split kernel
  (ops/radix.py hash mode).
- The probe kernel's grid runs over (hash-bucket x chunk group); each
  step's 2^17-bit filter slice (32 vreg rows) is VMEM-resident via a
  pipelined BlockSpec — the VMEM-residency that the B-bit block gives a
  CPU cacheline.  Per element it recomputes the block (crc32c), derives
  the k enhanced-double-hashing positions (bloom.probe_positions math,
  bit-exact), tests them against the slice with the 128-lane gather
  ladder, and emits the key if ALL k bits are set — else PAD.
- Output blocks are grid-indexed (disjoint by construction): step g owns
  output rows [g*c_rows, (g+1)*c_rows).  Every S element lies inside its
  own bucket's window, appears as a live key exactly once (other steps
  whose windows overlap it emit PAD there), so the pruned output is an
  exact permutation of the surviving multiset, capacity-padded.

The pruned output feeds plan_radix_join directly (the join partition
accepts any order and drops PADs), so the full bloom pipeline is
hash-partition -> VMEM filter probe -> key-partition -> bitmap probe.

The BASIC variant spreads its k probes across the whole m-bit space — by
construction cache-hostile (the thesis's argument against it) — and has no
slice-local formulation; it stays on the portable XLA tier, as does
blocked with m beyond 2^27 (partition depth > 10 bits).
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

from hwbloomradixjoin_tpu.config import BloomArgs, BloomVariant
from hwbloomradixjoin_tpu.ops import bitmap_join, bloom as bloom_ops
from hwbloomradixjoin_tpu.ops import hashes
from hwbloomradixjoin_tpu.ops import radix as radix_ops
from hwbloomradixjoin_tpu.ops import u32 as U
from hwbloomradixjoin_tpu.ops.radix import LANES, PAD_KEY

SLICE_BITS = 17            # 2^17-bit slices = 32 vreg rows of words
MAX_PART_BITS = 10


MAX_PART_BITS_2PASS = 20   # 2-pass partition depth cap (m <= 2^37 b=512)


def geometry_raw(args: BloomArgs):
    """(part_bits, hash_bits) for slice-resident probing; None if the
    variant/geometry has no Pallas formulation at any partition depth."""
    if args.variant != BloomVariant.BLOCKED:
        return None
    hash_bits = (args.nblocks - 1).bit_length() if args.nblocks > 1 else 0
    b_bits = (args.B - 1).bit_length()
    if b_bits > SLICE_BITS:
        return None    # block exceeds a slice -> portable XLA fallback
    part_bits = max(hash_bits - (SLICE_BITS - b_bits), 0)
    if part_bits > hash_bits or part_bits > MAX_PART_BITS_2PASS:
        return None
    return part_bits, hash_bits


def geometry(args: BloomArgs):
    """(part_bits, hash_bits) for the SINGLE-pass tier; None if too deep.

    Deeper geometries (the flagship m=2^30 B=512 needs 13 partition
    bits) go through the 2-pass tier (plan_bloom_prune_2pass): a single
    pass at >10 bits leaves (chunk, bucket) runs smaller than a DMA
    window, amplifying probe traffic ~10x, while two passes produce one
    dense contiguous run per final bucket — the same argument that fixed
    NUM_PASSES=2 in the reference (prj_params.h:15-22, run.py:205-211).
    """
    g = geometry_raw(args)
    if g is None or g[0] > MAX_PART_BITS:
        return None
    return g


def _probe_kernel_for(geom: bitmap_join.ProbeGeom, args: BloomArgs,
                      hash_bits: int):
    sl_rows = geom.sl_rows
    c_rows = geom.c_rows
    ch = geom.ch_per_step
    ngroups = geom.ngroups
    nchunks = geom.nchunks
    nt = geom.ntiles
    part_bits = geom.part_bits
    bmask = (1 << hash_bits) - 1
    blocks_per_slice_mask = (1 << max(hash_bits - part_bits, 0)) - 1
    b_words = args.B // 32

    def kern(row_d, own_d, sl_ref, s_ref, out_keys, out_n, sbuf, sem, acc):
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        b = g // (ngroups * nt)
        gi = (g // nt) - b * ngroups

        @pl.when(g == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        nlive = jnp.minimum(nchunks - gi * ch, ch)
        for t in range(ch):
            @pl.when(t < nlive)
            def _():
                pltpu.make_async_copy(
                    s_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    sbuf.at[pl.ds(t * c_rows, c_rows), :], sem).start()
        for t in range(ch):
            @pl.when(t < nlive)
            def _():
                pltpu.make_async_copy(
                    s_ref.at[pl.ds(row_d[0, 0, t], c_rows), :],
                    sbuf.at[pl.ds(t * c_rows, c_rows), :], sem).wait()

        sl = sl_ref[:]
        live_rows = nlive * c_rows
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def sub(u, _):
            t = u // (c_rows // 8)
            r = pl.multiple_of(u * 8, 8)
            k = sbuf[pl.ds(r, 8), :]
            block = hashes.hash_crc(jnp.uint32(args.seed), k) \
                & jnp.uint32(bmask)
            mine = ((block >> (hash_bits - part_bits)).astype(jnp.int32)
                    == b) if part_bits else jnp.full(k.shape, True)
            # rows past the live window hold stale staging data -> PAD out;
            # the ownership range dedupes the tiles of a heavy run
            abs_row = row_d[0, 0, t] + (r - t * c_rows) + row_iota
            owned = (abs_row >= own_d[0, 0, t]) \
                & (abs_row < own_d[0, 0, t] + c_rows)
            mine = mine & (k != PAD_KEY) & (u * 8 < live_rows) & owned
            local = (block & jnp.uint32(blocks_per_slice_mask)
                     ).astype(jnp.int32)
            base_w = local * b_words
            keep = mine
            for pos in bloom_ops.probe_positions(k, args.seed, args.B,
                                                 args.k):
                w = base_w + (pos >> 5).astype(jnp.int32)
                lane = w & (LANES - 1)
                rowj = w >> 7
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
                keep = keep & (((v >> (pos & jnp.uint32(31)).astype(
                    jnp.int32)) & 1) != 0)
            out_keys[pl.ds(r, 8), :] = jnp.where(keep, k,
                                                 jnp.int32(PAD_KEY))
            acc[:] += keep.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, (ch * c_rows) // 8, sub, 0)

        @pl.when(g == ng - 1)
        def _():
            out_n[0, 0] = jnp.sum(acc[:])
    return kern


def bloom_probe_prune(bitmap_words, s_part, row_d, own_d,
                      geom: bitmap_join.ProbeGeom, args: BloomArgs,
                      hash_bits: int, interpret: bool = False):
    """Prune hash-partitioned S against the filter.

    Returns (pruned keys (G*ch*c_rows, 128) — survivors as keys, all else
    PAD, each survivor exactly once — and the survivor count).
    """
    G = geom.grid
    gnt = geom.ngroups * geom.ntiles
    win = geom.ch_per_step * geom.c_rows
    smem_desc = pl.BlockSpec((1, 1, geom.ch_per_step), lambda g: (g, 0, 0),
                             memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        _probe_kernel_for(geom, args, hash_bits),
        grid=(G,),
        in_specs=[
            smem_desc, smem_desc,
            pl.BlockSpec((geom.sl_rows, LANES),
                         lambda g, gnt=gnt: (g // gnt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((win, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G * win, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((win, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=bitmap_join.VMEM_LIMIT),
    )(row_d, own_d, bitmap_words, s_part)
    return outs[0], outs[1][0, 0]


@dataclasses.dataclass
class BloomPrunePlan:
    prune_fn: "callable"       # chain -> (pruned_keys, survivors)
    build_usec: float
    geom: bitmap_join.ProbeGeom


def plan_bloom_prune(r_key, s_key, args: BloomArgs,
                     interpret: bool = False,
                     chunk_rows: int = bitmap_join.CHUNK_ROWS):
    """Build filter from R (plan time) + compile the fused prune pipeline.

    Returns None when the geometry is unsuitable (basic variant, or m too
    large for slice-resident partitioning) — callers fall back to the
    portable XLA prune.
    """
    g = geometry(args)
    if g is None:
        g2 = geometry_raw(args)
        if g2 is not None:
            # too deep for one pass -> dense 2-pass hash partition
            return plan_bloom_prune_2pass(r_key, s_key, args, g2[0], g2[1],
                                          interpret=interpret,
                                          chunk_rows=chunk_rows)
        return None
    part_bits, hash_bits = g
    if interpret:
        chunk_rows = min(chunk_rows, 1024)
    # slice rows: blocks_per_slice * words_per_block / 128 (<= 32 by the
    # SLICE_BITS cap; can be smaller when the whole filter fits one slice)
    sl_rows = max((1 << (hash_bits - part_bits)) * (args.B // 32) // LANES, 1)
    if sl_rows % 8 and not interpret:
        return None     # Mosaic needs 8-row blocks; tiny m -> XLA filter

    t0 = time.perf_counter()
    bm = jax.jit(lambda rk: bloom_ops.build_bitmap_xla(rk, args)
                 .astype(jnp.int32).reshape(-1, LANES))(r_key)
    bm = jax.block_until_ready(bm)
    build_usec = (time.perf_counter() - t0) * 1e6

    pgeom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=part_bits,
                                hash_seed=args.seed, hash_bits=hash_bits)
    chunk = chunk_rows * LANES
    part = jax.jit(lambda sk, chain: radix_ops.partition_pass(
        sk + chain * 0, interpret=interpret, geom=pgeom))
    sk_in = radix_ops._chunk_pad(s_key, chunk)
    nchunks = sk_in.shape[0] // chunk
    s_part, starts = part(sk_in, jnp.int32(0))

    F = 1 << part_bits
    st = np.asarray(starts).reshape(nchunks, -1)[:, :F + 1].astype(np.int64)
    max_run = int((st[:, 1:] - st[:, :-1]).max()) if nchunks else 1
    geom = bitmap_join._probe_geom(part_bits, 0, sl_rows, 0, chunk_rows,
                                   nchunks, max_run)

    # the filter bitmap rides as a jit ARGUMENT (a closed-over device
    # array becomes an HLO constant — 128 MiB at the flagship m=2^30,
    # past the remote-compile payload limit)
    def prune_from(fbm, sk, chain):
        sp, stt = part(sk, chain)
        rd, od = bitmap_join.derive_descs(stt.reshape(nchunks, -1, LANES),
                                          geom)
        return bloom_probe_prune(fbm, sp, rd, od, geom, args, hash_bits,
                                 interpret=interpret)

    prune_jit = jax.jit(prune_from)
    jax.block_until_ready(prune_jit(bm, sk_in, jnp.int32(0)))
    return BloomPrunePlan(prune_fn=lambda c: prune_jit(bm, sk_in, c),
                          build_usec=build_usec, geom=geom)


def plan_bloom_prune_2pass(r_key, s_key, args: BloomArgs, part_bits: int,
                           hash_bits: int, interpret: bool = False,
                           chunk_rows: int = bitmap_join.CHUNK_ROWS):
    """Deep-geometry prune: 2-pass hash partition + slice probe.

    The flagship blocked config m=2^30 B=512 (BASELINE config 3, the
    golden-FPR geometry) needs 13 partition bits for 2^17-bit slices;
    a single pass at that depth leaves ~64-element (chunk, bucket) runs
    — so pass 1 partitions by the TOP b1 block-index bits, pass 2
    regroups each pass-1 bucket into a contiguous region sub-split by
    the next b2 bits (multipass.pass2_partition in hash mode), and the
    probe serves one dense run per final bucket.  Mirrors the reference
    2-pass choreography with the filter fused into the S pass
    (parallel_radix_join_bloom.c:798-849, 1851-1889).
    """
    from hwbloomradixjoin_tpu.ops import multipass

    if interpret:
        chunk_rows = min(chunk_rows, 1024)
    sl_rows = max((1 << (hash_bits - part_bits)) * (args.B // 32) // LANES,
                  1)
    if sl_rows % 8 and not interpret:
        return None
    b1 = min(part_bits - 1, MAX_PART_BITS)
    b2 = part_bits - b1
    if b2 < 1:
        return None

    t0 = time.perf_counter()
    bm = jax.jit(lambda rk: bloom_ops.build_bitmap_xla(rk, args)
                 .astype(jnp.int32).reshape(-1, LANES))(r_key)
    bm = jax.block_until_ready(bm)
    build_usec = (time.perf_counter() - t0) * 1e6

    p1geom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=b1,
                                 hash_seed=args.seed, hash_bits=hash_bits)
    chunk = chunk_rows * LANES
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
        return None                         # heavy hash skew -> XLA prune
    if nchunks * c1_rows > 8 * bitmap_join.SBUF_BUDGET_ROWS or nchunks > 2048:
        return None
    cap_rows = (int(-(-(runs1.sum(0).max() + nchunks * LANES) // LANES))
                + 7) & ~7
    cap_rows = min(cap_rows, nchunks * c1_rows)
    cr2 = ((F2 + 1 + LANES - 1) // LANES + 7) & ~7
    p2 = multipass.Pass2Geom(
        b1=b1, b2=b2, shift1=0, shift2=0, lo=0, hi=0,
        chunk_rows=chunk_rows, nchunks=nchunks, c1_rows=c1_rows,
        cap_rows=cap_rows, cat2_rows=cr2,
        hash_seed=args.seed, hash_bits=hash_bits)

    sp2, starts2 = jax.jit(lambda s1, st1: multipass.pass2_partition(
        s1, multipass._descs1(st1, p2), p2, interpret=interpret))(
            sp1, starts1)
    st2 = np.asarray(starts2).reshape(F1, -1)[:, :F2 + 1].astype(np.int64)
    run2_max = int((st2[:, 1:] - st2[:, :-1]).max())
    run2_rows = int(-(-run2_max // LANES)) + 1
    c_rows = min((run2_rows + 7) & ~7, cap_rows, bitmap_join.C_ROWS_CAP)
    ntiles = max(1, -(-run2_rows // c_rows))
    pgeom = bitmap_join.ProbeGeom(
        part_bits=part_bits, shift=0, sl_rows=sl_rows, lo=0,
        chunk_rows=cap_rows, nchunks=1, c_rows=c_rows,
        ch_per_step=1, ngroups=1, ntiles=ntiles)

    def prune_from(fbm, sk, chain):
        s1, st1 = part1(sk, chain)
        s2, st2d = multipass.pass2_partition(
            s1, multipass._descs1(st1, p2), p2, interpret=interpret)
        rd, od = multipass.derive_descs_contig(st2d, pgeom, p2)
        return bloom_probe_prune(fbm, s2, rd, od, pgeom, args, hash_bits,
                                 interpret=interpret)

    prune_jit = jax.jit(prune_from)
    jax.block_until_ready(prune_jit(bm, sk_in, jnp.int32(0)))
    return BloomPrunePlan(prune_fn=lambda c: prune_jit(bm, sk_in, c),
                          build_usec=build_usec, geom=pgeom)
