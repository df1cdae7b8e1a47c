"""The TPU radix-join engine: MSB radix partition + VMEM bitmap probe.

This is the hardware-conscious core, the engine the reference's PRO plays on
CPU (parallel_radix_join.c:255,735) re-derived from TPU constraints and from
measured primitive throughputs (tools/microbench.py):

- XLA gather/scatter/sort all run at 0.08-0.3 G elem/s on this chip, so the
  hot path must be Pallas streaming kernels.  The VPU's in-kernel per-lane
  gather (take_along_axis axis=1) runs at ~1 op/elem, so a probe structure
  must be navigable by 128-lane row lookups plus a short select ladder over
  slice rows — the measured ladder cost is ~0.25 + 0.004*sl_rows ns/elem.
- Partitioning via the bit-serial split network costs ~0.31 ns/elem/bit
  (measured), so fan-out is chosen to minimize split_bits + ladder_rows:
  each bucket covers 2^shift keys with shift ~17 (slice = 32 vreg rows,
  16 KiB, VMEM-resident for the whole bucket probe) — the VMEM-residency
  analogue of the reference's cache-line blocks (bloom_filter.c:125-141)
  and of NUM_RADIX_BITS bounding fan-out to TLB reach (prj_params.h:15-22).
- Pass 1 (Pallas `partition_pass`, ops/radix.py) streams S through VMEM
  chunks, splitting each chunk bucket-major by the TOP bits of the
  normalized key, with pruning fused into the pass: PAD keys (bloom-pruned
  or out of range) drop into the pad category — the dataflow of
  parallel_radix_join_bloom.c:798-849.
- The probe kernel's grid runs over (bucket x chunk-group); per step it has
  the bucket's bitmap slice VMEM-resident (BlockSpec-pipelined) and DMAs a
  fixed window of each chunk's bucket run.  Run-window descriptors are ONE
  int32 per (chunk, bucket), derived ON DEVICE from the partition pass's
  starts output and fed through a pipelined SMEM BlockSpec — O(1) SMEM
  residency at any |S| (round 2 kept all descriptors in scalar-prefetch
  SMEM, which overflows at production geometry).  Validity masks are
  recomputed from the keys themselves (bucket-of-key == step bucket), and
  windows are clamped inside their own chunk, so no window can ever count
  an element of another chunk or bucket.

Exactness: the filter is an *exact* bitmap over R's declared key range
(unique build keys => one bit per key, no false positives), so the count
needs no residual verification.  Non-unique build sides fall back to the
portable tiers (models/registry.py).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hwbloomradixjoin_tpu.ops import radix as radix_ops
from hwbloomradixjoin_tpu.ops.radix import LANES, PAD_KEY

CHUNK_ROWS = 4096          # partition chunk: 512K elements (2 MiB keys)
MAX_SL_ROWS = 32           # bucket slice: 32 vreg rows = 16 KiB = 2^17 keys
SBUF_BUDGET_ROWS = 4096    # probe staging budget: 2 MiB of VMEM
VMEM_LIMIT = 100 * 1024 * 1024


def plan_geometry(lo: int, hi: int, num_radix_bits: Optional[int] = None):
    """Derive (part_bits, shift, sl_rows) from the build-side key range.

    Each bucket covers 2^shift keys; shift defaults to range_bits - 12 ..
    down to range_bits - 17 so the slice is 1..32 vreg rows.  Default
    fan-out is the minimum the range forces (measured: split cost is
    0.31 ns/elem/bit while the ladder adds only 0.004 ns/elem/row, so
    fewer partition bits win until sl_rows ~128).  num_radix_bits
    (--engine-radix-bits) overrides fan-out within the hardware-valid
    window — the sweep axis of the reference's figure 9 (NUM_RADIX_BITS
    12..17, parallel_radix_join.c / prj_params.h:15-22).
    """
    span = hi - lo + 1
    range_bits = max((max(span - 1, 1)).bit_length(), 12)
    lo_bits = max(range_bits - 17, 0)
    hi_bits = max(range_bits - 12, 0)
    part_bits = lo_bits if num_radix_bits is None else (
        min(max(num_radix_bits, lo_bits), hi_bits))
    shift = range_bits - part_bits            # in [12, 17]
    # slice stride >= 8 rows: Mosaic requires block sublanes divisible by 8
    # (slices smaller than 2^15 bits get zero-padded rows)
    sl_rows = max(1 << (shift - 12), 8)
    return part_bits, shift, sl_rows


def build_bitmap(r_key, lo: int, hi: int, part_bits: int, shift: int,
                 sl_rows: int):
    """Exact membership bitmap over [lo, hi], laid out (F * sl_rows, 128).

    Bucket b's slice occupies rows [b*sl_rows, (b+1)*sl_rows); sl_rows may
    exceed the 2^shift bits a bucket covers (Mosaic 8-row alignment), in
    which case the slice tail rows stay zero.  Unique R keys => distinct
    (word, bit) pairs => scatter-ADD equals the reference's atomic
    fetch-OR (bloom_filter.c:84) with zero FPR.  R-side build phase; runs
    once per plan (XLA scatter — plan-time only).
    """
    nwords = (1 << part_bits) * sl_rows * LANES
    norm = r_key.astype(jnp.int32) - jnp.int32(lo)
    ok = (r_key >= lo) & (r_key <= hi)
    bucket = norm >> shift
    local = norm & ((1 << shift) - 1)
    w = jnp.where(ok, bucket * (sl_rows * LANES) + (local >> 5), nwords)
    bit = (norm & 31).astype(jnp.uint32)
    bm = jnp.zeros(nwords, jnp.uint32).at[w].add(
        (jnp.uint32(1) << bit), mode="drop")
    return bm.astype(jnp.int32).reshape((1 << part_bits) * sl_rows, LANES)


@dataclasses.dataclass(frozen=True)
class ProbeGeom:
    """Static probe-kernel geometry, derived once per plan."""
    part_bits: int
    shift: int
    sl_rows: int
    lo: int
    chunk_rows: int
    nchunks: int
    c_rows: int           # DMA window rows per (chunk, bucket) run tile
    ch_per_step: int      # chunks served per probe grid step
    ngroups: int          # chunk groups = grid steps per bucket
    # heavy runs (key skew) span several c_rows tiles instead of inflating
    # every window to the max run — the single-chip skew handling (the
    # reference's SKEW_HANDLING splits oversized partitions the same way,
    # parallel_radix_join_bloom.c:1175-1415)
    ntiles: int = 1

    @property
    def grid(self):
        return (1 << self.part_bits) * self.ngroups * self.ntiles


def derive_descs(starts, geom: ProbeGeom):
    """Device-side: partition starts -> DMA row + ownership descriptors.

    starts: (nchunks, cat_rows, 128) int32 from partition_pass (suffix-
    filled flat start offsets per category).  Two int32 per task: the DMA
    window's source row (clamped inside the chunk) and the tile's
    UNCLAMPED ownership start — in-kernel, an element counts only when its
    absolute row lies in its tile's ownership range (dedupes tiles of one
    run) and its key's bucket matches the step (dedupes across buckets).
    This replaces the round-2 vs/ve tables; the reference's task
    descriptors (parallel_radix_join.c:1130-1270) shrink to two ints.
    """
    F = 1 << geom.part_bits
    nchunks, ngroups, ch = geom.nchunks, geom.ngroups, geom.ch_per_step
    nt, c_rows = geom.ntiles, geom.c_rows
    st = starts.reshape(nchunks, -1)[:, :F]                # (nchunks, F)
    base = jnp.arange(nchunks, dtype=jnp.int32)[:, None] * geom.chunk_rows
    ustart = base + (st >> 7)                              # unclamped
    hi_row = jnp.broadcast_to(base + (geom.chunk_rows - c_rows),
                              ustart.shape)
    pad = ngroups * ch - nchunks
    if pad:
        z = jnp.zeros((pad, F), jnp.int32)
        ustart = jnp.concatenate([ustart, z])
        hi_row = jnp.concatenate([hi_row, z])

    def arrange(a):
        # (nchunks', F) -> (F, ngroups, ch) -> (F, ngroups, 1, ch)
        return (a.reshape(ngroups, ch, F).transpose(2, 0, 1)
                .reshape(F, ngroups, 1, ch))

    us = arrange(ustart)[:, :, None]                   # (F, ngroups, 1,1,ch)
    hi = arrange(hi_row)[:, :, None]
    tile = (jnp.arange(nt, dtype=jnp.int32) * c_rows).reshape(1, 1, nt, 1, 1)
    own = us + tile                                    # ownership start
    row = jnp.minimum(own, hi)                         # clamped DMA row
    shape = (F * ngroups * nt, 1, ch)
    return row.reshape(shape), own.reshape(shape)


def _probe_kernel_for(geom: ProbeGeom):
    sl_rows = geom.sl_rows
    c_rows = geom.c_rows
    ch = geom.ch_per_step
    ngroups = geom.ngroups
    nchunks = geom.nchunks
    nt = geom.ntiles
    lo = geom.lo
    shift = geom.shift

    def kern(row_d, own_d, bm_ref, s_ref, out_ref, sbuf, sem, acc):
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        b = g // (ngroups * nt)          # this step's bucket
        gi = (g // nt) - b * ngroups     # chunk-group index

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

        sl = bm_ref[:]                   # (sl_rows, 128) bucket slice
        live_rows = nlive * c_rows
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def sub(u, _):
            t = u // (c_rows // 8)       # chunk slot of this sub-block
            r = pl.multiple_of(u * 8, 8)
            k = sbuf[pl.ds(r, 8), :]
            norm = k - jnp.int32(lo)
            # bucket check on the FULL arithmetic shift: PAD keys and other
            # buckets (incl. window rows preceding the run) never alias b;
            # ownership check dedupes the tiles of a heavy run
            abs_row = row_d[0, 0, t] + (r - t * c_rows) + row_iota
            owned = (abs_row >= own_d[0, 0, t]) \
                & (abs_row < own_d[0, 0, t] + c_rows)
            ok = ((norm >> shift) == b) & owned
            w = (norm & ((1 << shift) - 1)) >> 5     # slice-local word
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
            acc[:] += jnp.where(ok, (v >> (norm & 31)) & 1, 0)
            return 0

        jax.lax.fori_loop(0, live_rows // 8, sub, 0)

        @pl.when(g == ng - 1)
        def _():
            out_ref[0, 0] = jnp.sum(acc[:])
    return kern


def bitmap_probe_count(bitmap, s_part, row_d, own_d, geom: ProbeGeom,
                       interpret: bool = False):
    """Count S matches: grid over (bucket x chunk-group x tile) steps."""
    G = geom.grid
    gnt = geom.ngroups * geom.ntiles
    smem_desc = pl.BlockSpec((1, 1, geom.ch_per_step), lambda g: (g, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _probe_kernel_for(geom),
        grid=(G,),
        in_specs=[
            smem_desc, smem_desc,
            pl.BlockSpec((geom.sl_rows, LANES),
                         lambda g, gnt=gnt: (g // gnt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((geom.ch_per_step * geom.c_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
    )(row_d, own_d, bitmap, s_part)
    return out[0, 0]


_FLOOR_USEC = [None]


def dispatch_floor_usec() -> float:
    """Measured per-dispatch floor (the axon tunnel adds ~25 ms round trip).

    Phase timings are single extra dispatches; subtracting the floor keeps
    them comparable to the fused steady-state program's wall time.
    """
    if _FLOOR_USEC[0] is None:
        f = jax.jit(lambda x: x + 1)
        int(f(jnp.int32(0)))
        best = None
        for i in range(3):
            t0 = time.perf_counter()
            int(f(jnp.int32(i)))
            dt = (time.perf_counter() - t0) * 1e6
            best = dt if best is None else min(best, dt)
        _FLOOR_USEC[0] = best
    return _FLOOR_USEC[0]


@dataclasses.dataclass
class RadixJoinPlan:
    """Compiled radix join; steady state is device-only.

    count() runs the full S-side pipeline on device: partition pass ->
    descriptor derivation -> probe, in one jitted program.  The R-side
    build (bitmap) lives in the plan, mirroring a served build side; its
    one-off build time is reported as the build phase.
    """

    count_fn: "callable"        # chain:int32 -> count (partition -> probe)
    part_fn: "callable"         # chain -> scalar probe of partitioned S
    probe_fn: "callable"        # chain -> count (probe only, cached part)
    s_tuples: int
    build_usec: float
    geom: ProbeGeom

    def count(self, chain=0) -> int:
        return int(self.count_fn(jnp.int32(chain)))

    def _time(self, fn) -> float:
        floor = dispatch_floor_usec()
        int(fn(jnp.int32(1)))            # warm: compile + first-run costs
        t0 = time.perf_counter()
        int(fn(jnp.int32(2)))
        raw = (time.perf_counter() - t0) * 1e6
        # clamp the subtraction: the floor estimate is congestion-noisy
        return max(raw - floor, 0.2 * raw)

    def time_partition(self) -> float:
        return self._time(self.part_fn)

    def time_probe(self) -> float:
        return self._time(self.probe_fn)


C_ROWS_CAP = 1024          # tile cap: heavy runs span tiles, not windows


def _probe_geom(part_bits, shift, sl_rows, lo, chunk_rows, nchunks,
                max_run_elems, c_rows_cap: Optional[int] = None):
    """Fix the probe window/staging geometry from the observed max run.

    c_rows is capped: a skewed run larger than the cap is served by
    multiple ownership-masked tiles instead of inflating every window
    (single-chip skew handling; no fallback bail-out remains).
    """
    if c_rows_cap is None:
        c_rows_cap = C_ROWS_CAP          # read at call time (testable)
    run_rows = -(-int(max_run_elems) // LANES) + 1   # +1 boundary row
    c_rows = min((run_rows + 7) & ~7, chunk_rows, c_rows_cap)
    ntiles = max(1, -(-run_rows // c_rows))
    ch = max(1, min(32, SBUF_BUDGET_ROWS // c_rows, nchunks))
    ngroups = -(-nchunks // ch)
    return ProbeGeom(part_bits=part_bits, shift=shift, sl_rows=sl_rows,
                     lo=lo, chunk_rows=chunk_rows, nchunks=nchunks,
                     c_rows=c_rows, ch_per_step=ch, ngroups=ngroups,
                     ntiles=ntiles)


def plan_radix_join(r_key, s_key, lo: int, hi: int,
                    interpret: bool = False,
                    chunk_rows: int = CHUNK_ROWS,
                    num_radix_bits: Optional[int] = None):
    """Build a radix-join plan: bitmap, partition program, probe program.

    Requires unique R keys in [lo, hi] (caller checks stats).  Returns None
    if a partition run overflows the probe staging budget (heavy skew —
    caller falls back, the analogue of SKEW_HANDLING's bail-outs).
    """
    if interpret:
        chunk_rows = min(chunk_rows, 1024)   # CPU-test speed; same semantics
    part_bits, shift, sl_rows = plan_geometry(lo, hi, num_radix_bits)
    pgeom = radix_ops.RadixGeom(chunk_rows=chunk_rows, part_bits=part_bits,
                                lo=lo, hi=hi, shift=shift)
    chunk = chunk_rows * LANES

    t0 = time.perf_counter()
    bitmap = jax.jit(functools.partial(
        build_bitmap, lo=lo, hi=hi, part_bits=part_bits, shift=shift,
        sl_rows=sl_rows)
    )(r_key)
    bitmap = jax.block_until_ready(bitmap)
    build_usec = (time.perf_counter() - t0) * 1e6

    part = jax.jit(lambda sk, chain: radix_ops.partition_pass(
        sk + chain * 0, interpret=interpret, geom=pgeom))
    sk_in = radix_ops._chunk_pad(jnp.asarray(s_key, jnp.int32), chunk)
    nchunks = sk_in.shape[0] // chunk
    s_part, starts = part(sk_in, jnp.int32(0))

    # one plan-time host sync: the max run length fixes the static window
    F = 1 << part_bits
    st = np.asarray(starts).reshape(nchunks, -1)[:, :F + 1].astype(np.int64)
    max_run = int((st[:, 1:] - st[:, :-1]).max()) if nchunks else 1
    geom = _probe_geom(part_bits, shift, sl_rows, lo, chunk_rows, nchunks,
                       max_run)

    def count_from(sk, chain):
        sp, stt = part(sk, chain)
        row_d, own_d = derive_descs(stt.reshape(nchunks, -1, LANES), geom)
        return bitmap_probe_count(bitmap, sp, row_d, own_d, geom,
                                  interpret=interpret)

    count_jit = jax.jit(count_from)
    descs0 = jax.jit(lambda stt: derive_descs(
        stt.reshape(nchunks, -1, LANES), geom))(starts)
    probe_jit = jax.jit(lambda sp, rd, chain: bitmap_probe_count(
        bitmap, sp + chain * 0, rd[0], rd[1], geom, interpret=interpret))
    # phase timing must read back a SCALAR (a full-array fetch crawls
    # through the tunnel); the sum is data-dependent on the whole pass
    part_scalar = jax.jit(
        lambda sk, chain: part(sk, chain)[0].ravel()[-1].astype(jnp.int32))
    # warm so steady-state timings exclude compiles
    int(count_jit(sk_in, jnp.int32(0)))

    return RadixJoinPlan(
        count_fn=lambda c: count_jit(sk_in, c),
        part_fn=lambda c: part_scalar(sk_in, c),
        probe_fn=lambda c: probe_jit(s_part, descs0, c),
        s_tuples=int(s_key.shape[0]),
        build_usec=build_usec,
        geom=geom)
