"""Pallas radix-partition kernels — the hardware-conscious core.

The reference's radix clustering (parallel_radix_partition,
parallel_radix_join.c:735; radix_cluster :570) streams tuples through
histogram+scatter passes whose fan-out is bounded by TLB/cache geometry.
The TPU analogue: stream chunks through VMEM and reorder each chunk into
bucket-major layout with a *stable bit-serial split network* — the VPU has
no vector scatter/gather, so data moves through monotone log-shift pack
stages (butterfly-style routing, congestion-free for monotone packing;
property-tested).  Bucket-grouped chunks + per-chunk bucket counts are the
pass output; multi-pass composition consumes the counts exactly as the
reference's prefix-summed histograms drive its scatter offsets.

Layout conventions:
- element order is flat row-major over (ROWS, 128) tiles
- categories are `bucket` in [0, F) for valid tuples and >= F for padding,
  so pads sort to the chunk tail and drop out of counts
- counting mode routes keys only; payload mode routes extra arrays

All functions here are jnp-level and run identically inside Pallas kernels
(TPU) and under pallas_call(interpret=True) (CPU tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PAD_KEY = -2147483648
BIG = 2**30  # python int: avoids captured-constant tracers in kernels


def _iota_flat(shape):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1))


def _flat_shift_left(x, d: int):
    """out[i] = x[i + d] flat row-major (wrapped garbage in the last d slots)."""
    if d == 0:
        return x
    if d % LANES == 0:
        return jnp.roll(x, -(d // LANES), 0)
    assert d < LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    a = jnp.roll(x, -d, 1)              # a[r][l] = x[r][(l+d)%128]
    b = jnp.roll(a, -1, 0)              # b[r][l] = x[r+1][(l+d)%128]
    return jnp.where(lane < LANES - d, a, b)


def _flat_shift_right(x, d: int):
    """out[i] = x[i - d] flat row-major (wrapped garbage in the first d slots)."""
    if d == 0:
        return x
    if d % LANES == 0:
        return jnp.roll(x, d // LANES, 0)
    assert d < LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    a = jnp.roll(x, d, 1)               # a[r][l] = x[r][(l-d)%128]
    b = jnp.roll(a, 1, 0)               # b[r][l] = x[r-1][(l-d)%128]
    return jnp.where(lane >= d, a, b)


def _row_shift_right_fill0(x, d: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= d, jnp.roll(x, d, 1), 0)


def _flat_exclusive_prefix(x):
    """Exclusive prefix sum in flat row-major order of an int32 (R,128) array.

    Hillis-Steele along lanes (7 steps) + sublane scan of row totals.
    """
    rows = x.shape[0]
    s = x
    for k in range(7):
        s = s + _row_shift_right_fill0(s, 1 << k)
    row_tot = s[:, LANES - 1:LANES]                       # (R,1) inclusive
    t = row_tot
    step = 1
    sub = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    while step < rows:
        t = t + jnp.where(sub >= step, jnp.roll(t, step, 0), 0)
        step <<= 1
    row_excl = t - row_tot
    return (s - x) + row_excl


ALIVE_BIT = 1 << 30   # python int: jnp constants get captured as tracers


def _pack(arrs, sel, disp, direction: str):
    """Monotone pack: move selected elements by `disp` flat slots left/right.

    LSB-first log-shift routing (congestion-free for monotone packs).
    Returns (arrs', alive') — unselected slots become dead.

    Routing state travels as ONE int32 per slot: M = disp | ALIVE_BIT for
    live slots, 0 for dead — halving the shifted side-channel arrays vs
    carrying (disp, alive) separately (displacements are < 2^30 by
    construction: chunk sizes are bounded far below that).
    """
    n = arrs[0].shape[0] * LANES
    idx = _iota_flat(arrs[0].shape)
    M = jnp.where(sel, disp | ALIVE_BIT, 0)
    shift = _flat_shift_left if direction == "L" else _flat_shift_right
    k = 0
    while (1 << k) < n:
        d = 1 << k
        arrs_in = [shift(a, d) for a in arrs]
        M_in = shift(M, d)
        # kill wrapped-in garbage at the boundary
        if direction == "L":
            M_in = jnp.where(idx < n - d, M_in, 0)
        else:
            M_in = jnp.where(idx >= d, M_in, 0)
        # move_in: incoming slot alive AND bit k of its displacement set;
        # stay: resident slot alive AND bit k clear — one and+compare each
        probe = ALIVE_BIT | (1 << k)
        move_in = (M_in & probe) == probe
        stay = (M & probe) == ALIVE_BIT
        arrs = [jnp.where(move_in, ai, a) for a, ai in zip(arrs, arrs_in)]
        M = jnp.where(move_in, M_in, jnp.where(stay, M, 0))
        k += 1
    return arrs, (M & ALIVE_BIT) != 0


def split_bit(cat, arrs, bit_idx: int, route_cat: bool = True):
    """One stable split step: reorder by bit `bit_idx` of `cat` (0s first).

    With route_cat=False the category does NOT ride the routing network
    (the caller recomputes it from the routed key each bit — ~6 VPU ops vs
    ~2*log2(chunk) shift stages of dead weight); the first return is then
    None.
    """
    idx = _iota_flat(cat.shape)
    bit = (cat >> bit_idx) & 1
    zeros = 1 - bit
    excl0 = _flat_exclusive_prefix(zeros)
    # total zeros in the chunk; jnp.sum (not a [-1,-1] scalar extract, which
    # lowers to dynamic_slice — unimplemented in Mosaic TC kernels)
    total0 = jnp.sum(zeros)
    all_arrs = ([cat] if route_cat else []) + list(arrs)
    # zeros: dst = excl0 (move left by idx - excl0)
    packedL, aliveL = _pack(all_arrs, bit == 0, idx - excl0, "L")
    # ones: dst = total0 + (idx - excl0) (move right by total0 - excl0)
    packedR, aliveR = _pack(all_arrs, bit == 1, total0 - excl0, "R")
    out = [jnp.where(aliveL, L, R) for L, R in zip(packedL, packedR)]
    if route_cat:
        return out[0], out[1:]
    return None, out


def split_chunk(cat, arrs, nbits: int, cat_fn=None):
    """Stable LSD bit-serial counting split by `nbits`-bit categories.

    The bit index is a dynamic fori_loop variable (the routing-stage shift
    distances inside split_bit stay static), keeping compiled program size
    independent of nbits.

    cat_fn, when given, recomputes the category from the routed arrays
    (cat_fn(*arrs) — normally bucket-of-key) so the category never rides
    the shift network; without it, cat is routed alongside arrs (needed
    when cat is expensive to recompute, e.g. hash-derived buckets).
    """
    arrs = list(arrs)

    if cat_fn is None:
        def body(b, carry):
            cat, arrs = carry
            cat, arrs = split_bit(cat, arrs, b)
            return (cat, arrs)

        cat, arrs = jax.lax.fori_loop(0, nbits, body, (cat, arrs))
        return cat, arrs

    def body(b, arrs):
        _, arrs = split_bit(cat_fn(*arrs), arrs, b, route_cat=False)
        return arrs

    arrs = jax.lax.fori_loop(0, nbits, body, arrs)
    return cat_fn(*arrs), arrs


def sorted_counts(cat_sorted, num_cats: int):
    """Per-category counts of a category-sorted chunk -> (1, 128) int32.

    Boundary extraction via one monotone pack (boundaries number <= 129),
    then tiny rotate-compare loops on the packed (2,128) head to build
    start positions; counts = suffix-min difference.
    """
    shape = cat_sorted.shape
    n = shape[0] * LANES
    idx = _iota_flat(shape)
    prev = _flat_shift_right(cat_sorted, 1)
    boundary = (idx == 0) | (cat_sorted != prev)
    nb_excl = _flat_exclusive_prefix(boundary.astype(jnp.int32))
    (pcat, pidx), alive = _pack([cat_sorted, idx], boundary,
                                idx - nb_excl, "L")
    # only the first two rows can hold boundaries (<= 129 <= 256 slots)
    head_c = jnp.where(alive[0:2], pcat[0:2], BIG)   # (2,128)
    head_i = jnp.where(alive[0:2], pidx[0:2], BIG)
    cats = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    start = jnp.full((1, LANES), BIG, jnp.int32)

    def rot_body(t, start):
        c = pltpu.roll(head_c, -t, 1)
        i = pltpu.roll(head_i, -t, 1)
        for r in range(2):
            hit = (c[r:r + 1] == cats)
            start = jnp.where(hit, jnp.minimum(start, i[r:r + 1]), start)
        return start

    start = jax.lax.fori_loop(0, LANES, rot_body, start)
    # end[c] = min start over categories > c (suffix min excl. self), default n
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    end = jnp.full((1, LANES), n, jnp.int32)
    cur = jnp.minimum(start, n)
    for k in range(7):
        d = 1 << k
        shifted = jnp.where(lane < LANES - d, jnp.roll(cur, -d, 1), n)
        end = jnp.minimum(end, shifted)
        cur = jnp.minimum(cur, shifted)
    counts = jnp.where(start >= jnp.int32(n), 0, end - start)
    mask = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) < num_cats
    return jnp.where(mask, counts, 0)


def sorted_starts_wide(cat_sorted, cat_rows: int):
    """Start offsets for up to cat_rows*128 categories -> (cat_rows, 128).

    Like sorted_counts but returns flat start positions (missing categories
    get the next present category's start via suffix-min, so run length =
    start[c+1] - start[c] with an appended total).  Category c maps to
    (c // 128, c % 128).
    """
    shape = cat_sorted.shape
    n = shape[0] * LANES
    idx = _iota_flat(shape)
    prev = _flat_shift_right(cat_sorted, 1)
    boundary = (idx == 0) | (cat_sorted != prev)
    nb_excl = _flat_exclusive_prefix(boundary.astype(jnp.int32))
    (pcat, pidx), alive = _pack([cat_sorted, idx], boundary,
                                idx - nb_excl, "L")
    nhead = min(shape[0], (cat_rows * LANES) // LANES + 1)
    head_c = jnp.where(alive[:nhead], pcat[:nhead], BIG)
    head_i = jnp.where(alive[:nhead], pidx[:nhead], BIG)
    target = _iota_flat((cat_rows, LANES))
    start = jnp.full((cat_rows, LANES), BIG, jnp.int32)

    def rot_body(t, start):
        c = pltpu.roll(head_c, -t, 1)
        i = pltpu.roll(head_i, -t, 1)
        for r in range(nhead):
            hit = c[r:r + 1] == target  # broadcast (1,128) vs (cat_rows,128)
            start = jnp.where(hit, jnp.minimum(start, i[r:r + 1]), start)
        return start

    start = jax.lax.fori_loop(0, LANES, rot_body, start)
    # fill missing categories with the next start (flat suffix-min), cap n
    start = jnp.minimum(start, n)
    cur = start
    k = 0
    while (1 << k) < cat_rows * LANES:
        d = 1 << k
        shifted = _flat_shift_left(cur, d)
        valid = _iota_flat(cur.shape) < cat_rows * LANES - d
        cur = jnp.minimum(cur, jnp.where(valid, shifted, n))
        k += 1
    # start[c] for missing c = next present start; recompute by min-scan from
    # the right: cur now holds suffix-min including self
    return cur


def _compact_kernel_for(lo: int, hi: int, cap_rows: int, chunk_rows: int):
    def kern(kin_ref, kout_ref, cnt_ref):
        key = kin_ref[:]
        live = (key >= lo) & (key <= hi)
        idx = _iota_flat(key.shape)
        excl = _flat_exclusive_prefix(live.astype(jnp.int32))
        # ONE monotone pack (live keys move left, stable); the dead tail
        # becomes PAD — half the routing work of a full split bit
        (pk,), alive = _pack([key], live, idx - excl, "L")
        out = jnp.where(alive, pk, jnp.int32(PAD_KEY))
        kout_ref[:] = out[:cap_rows]
        cnt_ref[:] = jnp.full((8, LANES), jnp.sum(live.astype(jnp.int32)),
                              jnp.int32)
    return kern


def compact_pass(keys_flat, lo: int, hi: int, chunk_rows: int,
                 cap_rows: Optional[int] = None, interpret: bool = False):
    """Live/dead compaction: each chunk's in-range keys move to its head.

    The cheap prune stream for low-selectivity workloads: out-of-range
    (and bloom-pruned PAD) tuples are dropped by ONE pack network instead
    of riding every split bit — the reference drops filtered tuples
    during pass-1 the same way (parallel_radix_join_bloom.c:798-849);
    here the surviving prefixes are then densified and the full-fan-out
    partition runs on survivors only.

    cap_rows truncates each chunk's output to its first cap_rows rows
    (plan-time-known max live rows), shrinking the written stream to the
    survivor footprint.  Returns (out (nchunks*cap_rows, 128), counts
    (nchunks*8, 128)) with counts[8c, 0] = live count of chunk c.
    """
    n = keys_flat.shape[0]
    chunk = chunk_rows * LANES
    assert n % chunk == 0, n
    nchunks = n // chunk
    cap = chunk_rows if cap_rows is None else cap_rows
    assert 8 <= cap <= chunk_rows and cap % 8 == 0, cap
    k2 = keys_flat.reshape(nchunks * chunk_rows, LANES)
    return pl.pallas_call(
        _compact_kernel_for(lo, hi, cap, chunk_rows),
        grid=(nchunks,),
        in_specs=[pl.BlockSpec((chunk_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((cap, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nchunks * cap, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nchunks * 8, LANES), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(k2)


CHUNK_ROWS = 1024          # 128K elements per partition chunk
PART_BITS = 12             # pass-1 fan-out: 4096 partitions
SEG_ROWS = 8               # gather segment: 8 rows = 1024 elements
S_SEGS = 128               # S segments per probe chunk (1024 rows)
R_SEGS = 40                # R segments per probe chunk (320 rows)


@functools.lru_cache(maxsize=None)
class RadixGeom:
    """Static kernel geometry (small variants for interpret-mode tests).

    bucket of a key = ((key - lo) >> shift) & (2^part_bits - 1).
    Defaults (lo=0, shift=0) give the reference's low-bit radix semantics
    (parallel_radix_join.c:735); the bitmap-probe engine uses MSB range
    partitioning (shift = range_bits - part_bits) so each bucket's filter
    slice is a contiguous, VMEM-resident block.  With hi set, out-of-range
    keys are dropped into the pad category during partitioning — the fused
    prune-during-pass-1 dataflow of parallel_radix_join_bloom.c:798-849.
    """

    def __init__(self, chunk_rows=CHUNK_ROWS, part_bits=PART_BITS,
                 s_segs=S_SEGS, r_segs=R_SEGS,
                 lo=0, hi=None, shift=0,
                 hash_seed=None, hash_bits=0, pad_cat=True):
        self.chunk_rows = chunk_rows
        self.part_bits = part_bits
        self.s_segs = s_segs
        self.r_segs = r_segs
        self.lo = lo
        self.hi = hi
        self.shift = shift
        # hash mode: bucket = crc32c(hash_seed, key) >> (hash_bits -
        # part_bits) — partitioning S by bloom BLOCK index so filter slices
        # are VMEM-resident in the probe (ops/bloom_pallas.py)
        self.hash_seed = hash_seed
        self.hash_bits = hash_bits
        # pad_cat=False drops the pad category: the split routes only
        # part_bits bits and PAD/slack elements land in a junk bucket
        # determined by PAD_KEY's wrapped norm.  Safe ONLY when downstream
        # consumers mask by bucket-of-key ((norm >> shift) == b, which PAD's
        # wrapped norm can never satisfy given lo <= 2^31 - 2^range_bits)
        # and when no real out-of-range keys exist in the stream (R builds,
        # compacted survivors) — callers assert that via pad_cat_safe().
        self.pad_cat = pad_cat
        # buckets + pad category, rounded up to a multiple of 8 rows so the
        # starts output block is Mosaic-tileable (sublane divisibility)
        cr = ((1 << part_bits) + 1 + LANES - 1) // LANES
        self.cat_rows = (cr + 7) & ~7


def pad_cat_safe(lo: int, hi: int) -> bool:
    """True iff PAD_KEY's wrapped norm can never alias a real bucket.

    norm(PAD) = PAD_KEY - lo wraps (int32) to 2^31 - lo; its bucket test
    (norm >> shift) == b fails for every b < F iff 2^31 - lo >= 2^range_bits.
    """
    span = hi - lo + 1
    range_bits = max((max(span - 1, 1)).bit_length(), 12)
    return 0 <= lo <= (1 << 31) - (1 << range_bits) and range_bits <= 30

DEFAULT_GEOM = RadixGeom()


def geom_cat_fn(geom):
    """bucket-of-key category function for range-partition geometries.

    Cheap enough (~6 VPU ops) to recompute after every split bit instead
    of routing the category through the shift network (split_chunk
    cat_fn).  Hash-derived buckets (geom.hash_seed) are NOT cheap to
    recompute — those geometries route cat instead.
    """
    def cat_fn(key, *rest):
        norm = key - jnp.int32(geom.lo)
        bucket = jax.lax.shift_right_logical(
            norm.astype(jnp.uint32), jnp.uint32(geom.shift)
        ).astype(jnp.int32) & ((1 << geom.part_bits) - 1)
        if not geom.pad_cat:
            # no pad category: PAD/slack keys land in a junk bucket and
            # are excluded downstream by the bucket-of-key ownership test
            return bucket
        valid = key != PAD_KEY
        if geom.hi is not None:
            valid = valid & (key >= geom.lo) & (key <= geom.hi)
        return jnp.where(valid, bucket, 1 << geom.part_bits)
    return cat_fn


def _partition_kernel_for(geom, with_payload: bool = False):
    def _partition_kernel(kin_ref, *rest):
        if with_payload:
            pin_ref, kout_ref, pout_ref, starts_ref = rest
        else:
            (kout_ref, starts_ref) = rest
        key = kin_ref[:]
        if geom.hash_seed is not None:
            from hwbloomradixjoin_tpu.ops import hashes
            valid = key != PAD_KEY
            block = hashes.hash_crc(jnp.uint32(geom.hash_seed), key) \
                & jnp.uint32((1 << geom.hash_bits) - 1)
            bucket = (block >> (geom.hash_bits - geom.part_bits)
                      ).astype(jnp.int32)
            cat = jnp.where(valid, bucket, 1 << geom.part_bits)
            cat_fn = None
        else:
            cat_fn = geom_cat_fn(geom)
            cat = cat_fn(key)
        nbits = geom.part_bits + (1 if geom.pad_cat else 0)
        if with_payload:
            cat_s, (key_s, pay_s) = split_chunk(cat, [key, pin_ref[:]],
                                                nbits, cat_fn=cat_fn)
            pout_ref[:] = pay_s
        else:
            cat_s, (key_s,) = split_chunk(cat, [key], nbits,
                                          cat_fn=cat_fn)
        kout_ref[:] = key_s
        starts_ref[:] = sorted_starts_wide(cat_s, geom.cat_rows)
    return _partition_kernel


def partition_pass(keys_flat, interpret: bool = False, geom=None):
    """Pass 1: 12-bit radix partition into chunk-major bucket-grouped layout.

    keys_flat: (n,) int32, n % (CHUNK_ROWS*128) == 0 (PAD_KEY padded).
    Returns (keys_out (rows,128), starts (nchunks, CAT_ROWS, 128)) where
    starts[c] holds flat start offsets of each bucket's run within chunk c
    (suffix-filled; run length = start[b+1] - start[b]).
    """
    geom = geom or DEFAULT_GEOM
    n = keys_flat.shape[0]
    chunk = geom.chunk_rows * LANES
    assert n % chunk == 0, n
    nchunks = n // chunk
    k2 = keys_flat.reshape(nchunks * geom.chunk_rows, LANES)
    cr = geom.chunk_rows
    car = geom.cat_rows
    return pl.pallas_call(
        _partition_kernel_for(geom),
        grid=(nchunks,),
        in_specs=[pl.BlockSpec((cr, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((cr, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((car, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nchunks * cr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nchunks * car, LANES), jnp.int32),
        ),
        interpret=interpret,
        # big chunks (4096 rows) need the split network's temporaries to
        # spill past the default 16 MiB scoped-vmem budget (v5e has 128 MiB)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(k2)


def partition_pass_kv(keys_flat, pays_flat, interpret: bool = False,
                      geom=None):
    """partition_pass routing a payload column alongside the keys.

    Returns (keys_out, pays_out, starts).  The payload rides the same split
    network (the reference scatters whole 8/16-byte tuples,
    parallel_radix_join.c:735; columnar TPU layout routes the two columns
    as parallel arrays instead).
    """
    geom = geom or DEFAULT_GEOM
    n = keys_flat.shape[0]
    chunk = geom.chunk_rows * LANES
    assert n % chunk == 0, n
    nchunks = n // chunk
    k2 = keys_flat.reshape(nchunks * geom.chunk_rows, LANES)
    p2 = pays_flat.reshape(nchunks * geom.chunk_rows, LANES)
    cr = geom.chunk_rows
    car = geom.cat_rows
    blk = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _partition_kernel_for(geom, with_payload=True),
        grid=(nchunks,),
        in_specs=[blk(cr), blk(cr)],
        out_specs=(blk(cr), blk(cr), blk(car)),
        out_shape=(
            jax.ShapeDtypeStruct((nchunks * cr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nchunks * cr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nchunks * car, LANES), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(k2, p2)


def build_gather_descriptors(starts: "np.ndarray", n_rows_src: int,
                             geom=None):
    """Host-side: per-bucket run lists -> fixed 8-row gather segments.

    starts: (nchunks, CAT_ROWS, 128) numpy array from partition_pass.
    Returns dict with per-bucket segment arrays:
      seg_bucket (M,), seg_row (M,), seg_vs (M,), seg_ve (M,)
    where segment i covers source rows [seg_row, seg_row+SEG_ROWS) and its
    live elements are flat positions [seg_vs, seg_ve) within that window.
    """
    import numpy as np

    geom = geom or DEFAULT_GEOM
    nchunks = starts.shape[0]
    flat = starts.reshape(nchunks, -1).astype(np.int64)
    F = 1 << geom.part_bits
    st = flat[:, :F + 1]                        # starts incl. pad cat start
    lens = st[:, 1:] - st[:, :-1]               # (nchunks, F)
    chunk_elems = geom.chunk_rows * LANES

    c_idx, b_idx = np.nonzero(lens > 0)
    o = st[c_idx, b_idx] + c_idx * chunk_elems
    ln = lens[c_idx, b_idx]
    end = o + ln
    row0 = (o // LANES) // SEG_ROWS * SEG_ROWS
    row_end = -(-end // LANES)
    nwin = (-(-(row_end - row0) // SEG_ROWS)).astype(np.int64)

    run_of_seg = np.repeat(np.arange(len(o)), nwin)
    # window index within its run: arange - run's first-seg offset
    first = np.concatenate([[0], np.cumsum(nwin)[:-1]])
    widx = np.arange(run_of_seg.shape[0]) - first[run_of_seg]
    row = row0[run_of_seg] + widx * SEG_ROWS
    row = np.minimum(row, n_rows_src - SEG_ROWS)
    base = row * LANES
    vs = np.maximum(o[run_of_seg] - base, 0)
    ve = np.minimum(end[run_of_seg] - base, SEG_ROWS * LANES)
    return dict(bucket=b_idx[run_of_seg].astype(np.int32),
                row=row.astype(np.int32),
                vs=vs.astype(np.int32), ve=ve.astype(np.int32))


def _probe_kernel_for(geom):
    R_SEGS = geom.r_segs
    S_SEGS = geom.s_segs
    part_bits = geom.part_bits
    invalid_bit = 33 - part_bits

    def _probe_kernel(s_row, s_vs, s_ve, r_row, r_vs, r_ve,
                      r_keys_ref, s_keys_ref, out_ref,
                      rbuf, sbuf, sems, acc):
        return _probe_body(s_row, s_vs, s_ve, r_row, r_vs, r_ve,
                           r_keys_ref, s_keys_ref, out_ref,
                           rbuf, sbuf, sems, acc,
                           R_SEGS, S_SEGS, part_bits, invalid_bit)
    return _probe_kernel


def _probe_body(s_row, s_vs, s_ve, r_row, r_vs, r_ve,
                r_keys_ref, s_keys_ref, out_ref,
                rbuf, sbuf, sems, acc,
                R_SEGS, S_SEGS, part_bits, invalid_bit):
    """One probe chunk: gather R+S run segments of one bucket, in-VMEM sort
    the union by (valid, key-high-bits, side), segmented-scan count matches.
    """
    g = pl.program_id(0)
    ng = pl.num_programs(0)

    @pl.when(g == 0)
    def _():
        acc[0] = 0

    # gather segments (fire all DMAs, then drain both semaphores)
    r_copies = [pltpu.make_async_copy(
        r_keys_ref.at[pl.ds(r_row[g, t], SEG_ROWS), :],
        rbuf.at[pl.ds(t * SEG_ROWS, SEG_ROWS), :], sems.at[0])
        for t in range(R_SEGS)]
    s_copies = [pltpu.make_async_copy(
        s_keys_ref.at[pl.ds(s_row[g, t], SEG_ROWS), :],
        sbuf.at[pl.ds(t * SEG_ROWS, SEG_ROWS), :], sems.at[1])
        for t in range(S_SEGS)]
    for cp in r_copies + s_copies:
        cp.start()
    for cp in r_copies + s_copies:
        cp.wait()

    # validity masks from segment descriptors
    def seg_valid(nsegs, vs_arr, ve_arr, shape):
        flat = _iota_flat((SEG_ROWS, LANES))
        rowsv = []
        for t in range(nsegs):
            rowsv.append((flat >= vs_arr[g, t]) & (flat < ve_arr[g, t]))
        return jnp.concatenate(rowsv, axis=0)

    r_valid = seg_valid(R_SEGS, r_vs, r_ve, None)
    s_valid = seg_valid(S_SEGS, s_vs, s_ve, None)

    rk = rbuf[:]
    sk = sbuf[:]
    key = jnp.concatenate([rk, sk], axis=0)
    valid = jnp.concatenate([r_valid, s_valid], axis=0)
    nr_rows = R_SEGS * SEG_ROWS
    tag = (jax.lax.broadcasted_iota(
        jnp.int32, key.shape, 0) >= nr_rows).astype(jnp.int32)  # 0=R 1=S

    # composite sort code: [invalid(1) | key>>part_bits | tag(1)]
    keyhi = jax.lax.shift_right_logical(
        key.astype(jnp.uint32), jnp.uint32(part_bits)).astype(jnp.int32)
    composite = jnp.where(valid, (keyhi << 1) | tag,
                          (1 << invalid_bit) | (keyhi << 1) | tag)
    comp_s, _ = split_chunk(composite, [], invalid_bit + 1)
    is_r = (comp_s & 1) == 0
    v_s = (comp_s >> invalid_bit) == 0
    r_pref = segmented_r_prefix(comp_s >> 1, is_r, v_s)
    contrib = jnp.sum(jnp.where((~is_r) & v_s, r_pref, 0), dtype=jnp.int32)
    acc[0] += contrib

    @pl.when(g == ng - 1)
    def _():
        out_ref[0, 0] = acc[0]


def gathered_probe_count(r_keys2d, s_keys2d, sdesc, rdesc,
                         interpret: bool = False, geom=None):
    """Count matches over co-partitioned R/S given probe-chunk descriptors.

    sdesc/rdesc: dicts of (G, S_SEGS)/(G, R_SEGS) int32 arrays
    (row, vs, ve) — same G (grid), each grid step one bucket's piece.
    """
    geom = geom or DEFAULT_GEOM
    G = sdesc["row"].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((geom.r_segs * SEG_ROWS, LANES), jnp.int32),
            pltpu.VMEM((geom.s_segs * SEG_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _probe_kernel_for(geom),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True),
    )(sdesc["row"], sdesc["vs"], sdesc["ve"],
      rdesc["row"], rdesc["vs"], rdesc["ve"],
      r_keys2d, s_keys2d)
    return out[0, 0]


def _chunk_pad(keys, chunk_elems: int):
    """Pad to a chunk multiple with PAD_KEY.

    numpy inputs are padded on host (at the 1B-row north-star scale a
    device-side concatenate would hold a second 4 GiB copy of S in HBM
    next to the original — the difference between fitting and OOM).
    """
    import numpy as np
    n = keys.shape[0]
    padded = -(-max(n, 1) // chunk_elems) * chunk_elems
    if padded == n:
        return jnp.asarray(keys)
    if isinstance(keys, np.ndarray):
        return jnp.asarray(np.concatenate(
            [keys, np.full(padded - n, PAD_KEY, np.int32)]))
    return jnp.concatenate(
        [keys, jnp.full((padded - n,), jnp.int32(PAD_KEY))])


def group_descriptors(r_segs, s_segs, geom=None):
    """Host-side: align per-bucket R/S segment lists into probe chunks.

    Each probe chunk serves ONE bucket: up to S_SEGS S segments paired with
    that bucket's R segments (up to R_SEGS).  Buckets with more S segments
    span several chunks (R segments repeated); buckets whose R exceeds
    R_SEGS segments overflow -> caller must fall back (returned as flag).
    """
    import numpy as np

    geom = geom or DEFAULT_GEOM
    F = 1 << geom.part_bits
    S_SEGS = geom.s_segs
    R_SEGS = geom.r_segs
    s_cnt = np.bincount(s_segs["bucket"], minlength=F)
    r_cnt = np.bincount(r_segs["bucket"], minlength=F)
    if (r_cnt > R_SEGS).any():
        return None, None, True
    live = (s_cnt > 0) & (r_cnt > 0)
    if not live.any():
        return None, None, False

    s_ord = np.argsort(s_segs["bucket"], kind="stable")
    r_ord = np.argsort(r_segs["bucket"], kind="stable")
    s_first = np.concatenate([[0], np.cumsum(s_cnt)[:-1]])
    r_first = np.concatenate([[0], np.cumsum(r_cnt)[:-1]])

    # probe chunks: bucket b contributes ceil(s_cnt/S_SEGS) chunks
    nch = np.where(live, -(-s_cnt // S_SEGS), 0)
    buckets = np.repeat(np.arange(F), nch)
    first_ch = np.concatenate([[0], np.cumsum(nch)[:-1]])
    ch_in_b = np.arange(len(buckets)) - first_ch[buckets]
    G = len(buckets)

    # S slots: (G, S_SEGS) source segment indices (or -1 pad)
    slot = np.arange(S_SEGS)
    s_seg_idx = (s_first[buckets][:, None] + ch_in_b[:, None] * S_SEGS + slot)
    s_valid = s_seg_idx < (s_first[buckets] + s_cnt[buckets])[:, None]
    s_src = s_ord[np.minimum(s_seg_idx, len(s_ord) - 1)]
    sdesc = {
        "row": np.where(s_valid, s_segs["row"][s_src], 0).astype(np.int32),
        "vs": np.where(s_valid, s_segs["vs"][s_src], 0).astype(np.int32),
        "ve": np.where(s_valid, s_segs["ve"][s_src], 0).astype(np.int32),
    }
    rslot = np.arange(R_SEGS)
    r_seg_idx = r_first[buckets][:, None] + rslot
    r_valid = r_seg_idx < (r_first[buckets] + r_cnt[buckets])[:, None]
    r_src = r_ord[np.minimum(r_seg_idx, len(r_ord) - 1)]
    rdesc = {
        "row": np.where(r_valid, r_segs["row"][r_src], 0).astype(np.int32),
        "vs": np.where(r_valid, r_segs["vs"][r_src], 0).astype(np.int32),
        "ve": np.where(r_valid, r_segs["ve"][r_src], 0).astype(np.int32),
    }
    return sdesc, rdesc, False


def radix_join_count_pallas(r_keys, s_keys, interpret: bool = False,
                            geom=None):
    """General-path Pallas radix join (count mode).

    partition both sides by the low PART_BITS key bits (reference radix
    semantics), then probe bucket-by-bucket with gathered-run in-VMEM
    sort+scan counting.  Returns (count, overflow: bool) — overflow means a
    bucket's build side exceeded the probe kernel's R capacity (heavy key
    skew) and the caller must use the portable path.
    """
    import numpy as np

    geom = geom or DEFAULT_GEOM
    chunk = geom.chunk_rows * LANES
    rk = _chunk_pad(jnp.asarray(r_keys, jnp.int32), chunk)
    sk = _chunk_pad(jnp.asarray(s_keys, jnp.int32), chunk)
    rk2, rstarts = partition_pass(rk, interpret=interpret, geom=geom)
    sk2, sstarts = partition_pass(sk, interpret=interpret, geom=geom)
    rs = np.asarray(rstarts).reshape(-1, geom.cat_rows, LANES)
    ss = np.asarray(sstarts).reshape(-1, geom.cat_rows, LANES)
    r_segs = build_gather_descriptors(rs, rk2.shape[0], geom=geom)
    s_segs = build_gather_descriptors(ss, sk2.shape[0], geom=geom)
    sdesc, rdesc, overflow = group_descriptors(r_segs, s_segs, geom=geom)
    if overflow:
        return jnp.int32(0), True
    if sdesc is None:
        return jnp.int32(0), False
    cnt = gathered_probe_count(rk2, sk2, sdesc, rdesc, interpret=interpret,
                               geom=geom)
    return cnt, False


def segmented_r_prefix(key_sorted, is_r, valid):
    """For each row of a (key-sorted) chunk: #R rows earlier in its key segment.

    Segmented inclusive scan (Hillis-Steele with boundary resets) in flat
    row-major order; returns the count of R rows strictly before each
    element within its equal-key segment.
    """
    shape = key_sorted.shape
    idx = _iota_flat(shape)
    prev = _flat_shift_right(key_sorted, 1)
    prev_valid = _flat_shift_right(valid.astype(jnp.int32), 1) == 1
    new_seg = (idx == 0) | (key_sorted != prev) | (~prev_valid)
    # segmented exclusive scan of is_r
    val = is_r.astype(jnp.int32)
    seg = new_seg
    # inclusive segmented scan
    d = 1
    n = shape[0] * LANES
    while d < n:
        val_in = _flat_shift_right(val, d)
        seg_in = _flat_shift_right(seg.astype(jnp.int32), d) == 1
        ok = (idx >= d) & (~seg)
        val = jnp.where(ok, val + val_in, val)
        seg = jnp.where(idx >= d, seg | seg_in, seg)
        d <<= 1
    return val - is_r.astype(jnp.int32)  # exclusive
