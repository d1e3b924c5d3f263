"""Pallas TPU kernel for Block-ELL sparse x dense-batch matmul.

The XLA fallback in operators.BlockSparseOp.apply materializes a gathered
intermediate xg of shape (B, n_rb, KB, TN) in HBM before the batched einsum.
This kernel instead walks each output row-block's tile list: the tile
(tile_ids[r,k]) and the x column-block (col_blk[r,k]) are DMA'd HBM->VMEM per
slot and accumulated on the MXU, so HBM traffic is exactly tiles-touched +
x-blocks-touched.

Grid steps process GROUPS of 8 row-blocks: their index rows stream into SMEM
as an (8, KB) block per step (whole-array scalar prefetch would overflow the
~1MB SMEM at VGG scale, and TPU block shapes need the second-to-last dim
divisible by 8).

Layout convention matches BlockSparseOp: y[:, r*TM:(r+1)*TM] =
sum_k x[:, col_blk[r,k]*TN : +TN] @ tiles[tile_ids[r,k]]^T.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8  # row-blocks per grid step
NBUF = 8   # DMA pipeline depth: keep NBUF tile+x copies in flight so per-slot
           # DMA latency overlaps across several slots, not just one.
           # (NOTE: per-kernel wall time could not be isolated through the
           # axon tunnel this round — its ~34 ms host roundtrip floor swamps
           # the kernel; macro numbers: 8 TFLOP/s f32 at B=128 synthetic,
           # 1.01 s warm full VGG-orth-224 forward at B=1.)


def _kernel(tile_ids_ref, col_blk_ref,    # SMEM (GROUP, KB) for this group
            x_hbm, tiles_hbm,             # HBM operands
            out_ref,                      # VMEM output block (B, GROUP*TM)
            x_buf, t_buf, sems, precision):
    """NBUF-deep pipelined DMA: slots s..s+NBUF-1's x blocks and tiles are in
    flight while slot s multiplies on the MXU.  Flattened slot index
    s -> (row-block j, list pos k)."""
    KB = tile_ids_ref.shape[1]
    TN = x_buf.shape[2]
    TM = t_buf.shape[1]
    total = GROUP * KB
    out_ref[...] = jnp.zeros_like(out_ref)

    def copies(s, buf):
        j, k = s // KB, s % KB
        cb = col_blk_ref[j, k]
        tid = tile_ids_ref[j, k]
        return (pltpu.make_async_copy(x_hbm.at[:, pl.ds(cb * TN, TN)],
                                      x_buf.at[buf], sems.at[0, buf]),
                pltpu.make_async_copy(tiles_hbm.at[tid], t_buf.at[buf],
                                      sems.at[1, buf]))

    for s0 in range(NBUF - 1):  # unrolled prologue (static trip count)
        @pl.when(s0 < total)
        def _(s0=s0):
            cx, ct = copies(s0, s0 % NBUF)
            cx.start()
            ct.start()

    def body(s, _):
        buf = s % NBUF

        @pl.when(s + NBUF - 1 < total)
        def _():
            nx, nt = copies(s + NBUF - 1, (s + NBUF - 1) % NBUF)
            nx.start()
            nt.start()

        cx, ct = copies(s, buf)  # same refs/semaphore: wait on the in-flight DMA
        cx.wait()
        ct.wait()

        j = s // KB
        tid = tile_ids_ref[j, s % KB]

        # tile id 0 is the zero-padding tile: skip its FLOPs
        @pl.when(tid > 0)
        def _():
            out_ref[:, pl.ds(j * TM, TM)] += jax.lax.dot_general(
                x_buf[buf], t_buf[buf],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit, static_argnames=("n_out_padded", "interpret"))
def block_ell_matmul(x_padded, tiles, tile_ids, col_blk, n_out_padded,
                     interpret=False):
    """x_padded: (B, n_cb*TN) f32; tiles: (n_uniq, TM, TN); tile_ids/col_blk:
    (n_rb, KB) int32.  Returns (B, n_out_padded) f32 with
    n_out_padded = ceil(n_rb/GROUP)*GROUP*TM."""
    B = x_padded.shape[0]
    n_rb, KB = tile_ids.shape
    TM, TN = tiles.shape[1], tiles.shape[2]
    n_grp = -(-n_rb // GROUP)
    pad_r = n_grp * GROUP - n_rb
    if pad_r:
        tile_ids = jnp.pad(tile_ids, ((0, pad_r), (0, 0)))  # pad rows hit tile 0
        col_blk = jnp.pad(col_blk, ((0, pad_r), (0, 0)))
    from ..globals import kernel_precision as _prec
    dt = tiles.dtype  # f32 or bf16 (bf16 halves tile+x DMA; f32 accumulation)
    prec = _prec() if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    kernel = functools.partial(_kernel, precision=prec)
    y = pl.pallas_call(
        kernel,
        grid=(n_grp,),
        in_specs=[
            pl.BlockSpec((GROUP, KB), lambda r: (r, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GROUP, KB), lambda r: (r, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((B, GROUP * TM), lambda r: (0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_grp * GROUP * TM), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NBUF, B, TN), dt),   # pipelined x blocks
            pltpu.VMEM((NBUF, TM, TN), dt),  # pipelined tiles
            pltpu.SemaphoreType.DMA((2, NBUF)),
        ],
        interpret=interpret,
    )(tile_ids, col_blk, x_padded.astype(dt), tiles)
    return y[:, :n_out_padded]


def _kernel_xres(tile_ids_ref, col_blk_ref,  # SMEM (GROUP, KB) for this group
                 x_vmem, tiles_hbm,          # VMEM-resident x, HBM tiles
                 out_ref,                    # VMEM output block (B, GROUP*TM)
                 t_buf, sems, precision):
    """x-resident slot walk: ONE tile DMA per slot, x blocks sliced straight
    out of VMEM.  The HBM-operand kernel (_kernel) is scalar-core-bound, not
    bandwidth-bound — two DMA start/wait pairs per slot cost ~0.25 us of
    descriptor issue on the scalar core, which is why halving the bytes
    (bf16 tiles) only cut 13% of its time (docs/SERVING.md round-3 table).
    Keeping x in VMEM halves the per-slot DMA issues AND drops total HBM
    traffic from slots*(tile+x block) to slots*tile + x-once."""
    KB = tile_ids_ref.shape[1]
    TN = t_buf.shape[2]
    TM = t_buf.shape[1]
    total = GROUP * KB
    out_ref[...] = jnp.zeros_like(out_ref)

    def tcopy(s, buf):
        tid = tile_ids_ref[s // KB, s % KB]
        return pltpu.make_async_copy(tiles_hbm.at[tid], t_buf.at[buf],
                                     sems.at[buf])

    for s0 in range(NBUF - 1):  # unrolled prologue (static trip count)
        @pl.when(s0 < total)
        def _(s0=s0):
            tcopy(s0, s0 % NBUF).start()

    def body(s, _):
        buf = s % NBUF

        @pl.when(s + NBUF - 1 < total)
        def _():
            tcopy(s + NBUF - 1, (s + NBUF - 1) % NBUF).start()

        tcopy(s, buf).wait()
        j, k = s // KB, s % KB
        tid = tile_ids_ref[j, k]

        # tile id 0 is the zero-padding tile: skip its FLOPs
        @pl.when(tid > 0)
        def _():
            cb = col_blk_ref[j, k]
            out_ref[:, pl.ds(j * TM, TM)] += jax.lax.dot_general(
                x_vmem[:, pl.ds(cb * TN, TN)], t_buf[buf],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit, static_argnames=("n_out_padded", "interpret"))
def block_ell_matmul_xres(x_padded, tiles, tile_ids, col_blk, n_out_padded,
                          interpret=False):
    """x-VMEM-resident variant of block_ell_matmul (same contract).  Caller
    gates on the whole padded x fitting the VMEM budget
    (BlockSparseOp._pallas_ok); preferred when it fits — one DMA per slot
    instead of two, and x leaves HBM exactly once."""
    B = x_padded.shape[0]
    n_rb, KB = tile_ids.shape
    TM, TN = tiles.shape[1], tiles.shape[2]
    n_grp = -(-n_rb // GROUP)
    pad_r = n_grp * GROUP - n_rb
    if pad_r:
        tile_ids = jnp.pad(tile_ids, ((0, pad_r), (0, 0)))
        col_blk = jnp.pad(col_blk, ((0, pad_r), (0, 0)))
    from ..globals import kernel_precision as _prec
    dt = tiles.dtype
    prec = _prec() if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    kernel = functools.partial(_kernel_xres, precision=prec)
    y = pl.pallas_call(
        kernel,
        grid=(n_grp,),
        in_specs=[
            pl.BlockSpec((GROUP, KB), lambda r: (r, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GROUP, KB), lambda r: (r, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x fully VMEM-resident
            pl.BlockSpec(memory_space=pltpu.ANY),   # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((B, GROUP * TM), lambda r: (0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_grp * GROUP * TM), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NBUF, TM, TN), dt),  # pipelined tiles
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(tile_ids, col_blk, x_padded.astype(dt), tiles)
    return y[:, :n_out_padded]


def _kernel_xres2(tile_ids_ref, col_blk_ref,  # SMEM (GROUP, KBP) padded-even
                  x_vmem, tiles_hbm,
                  out_ref, t_buf, sems, precision):
    """Pair-depth x-resident slot walk: two slots of the same row-block fuse
    into ONE (B, 2TN) x (TM, 2TN) dot — the measured ~0.3 us/slot floor is
    dot-issue/accumulate overhead, not DMA (bf16 halves the bytes but not the
    time), so doubling the contraction depth amortizes it over two slots.
    KB is padded to even with zero slots (tile 0 contributes exact zeros)."""
    KBP = tile_ids_ref.shape[1]
    TN = t_buf.shape[2] // 2
    TM = t_buf.shape[1]
    pairs = GROUP * (KBP // 2)

    def copies(sp, buf):
        j, q = sp // (KBP // 2), sp % (KBP // 2)
        t1 = tile_ids_ref[j, 2 * q]
        t2 = tile_ids_ref[j, 2 * q + 1]
        return (pltpu.make_async_copy(tiles_hbm.at[t1],
                                      t_buf.at[buf, :, pl.ds(0, TN)],
                                      sems.at[0, buf]),
                pltpu.make_async_copy(tiles_hbm.at[t2],
                                      t_buf.at[buf, :, pl.ds(TN, TN)],
                                      sems.at[1, buf]))

    for s0 in range(NBUF - 1):
        @pl.when(s0 < pairs)
        def _(s0=s0):
            c1, c2 = copies(s0, s0 % NBUF)
            c1.start()
            c2.start()

    out_ref[...] = jnp.zeros_like(out_ref)

    def body(sp, _):
        buf = sp % NBUF

        @pl.when(sp + NBUF - 1 < pairs)
        def _():
            n1, n2 = copies(sp + NBUF - 1, (sp + NBUF - 1) % NBUF)
            n1.start()
            n2.start()

        c1, c2 = copies(sp, buf)
        c1.wait()
        c2.wait()
        j, q = sp // (KBP // 2), sp % (KBP // 2)

        @pl.when((tile_ids_ref[j, 2 * q] > 0) | (tile_ids_ref[j, 2 * q + 1] > 0))
        def _():
            cb1 = col_blk_ref[j, 2 * q]
            cb2 = col_blk_ref[j, 2 * q + 1]
            xc = jnp.concatenate(
                [x_vmem[:, pl.ds(cb1 * TN, TN)],
                 x_vmem[:, pl.ds(cb2 * TN, TN)]], axis=1)
            out_ref[:, pl.ds(j * TM, TM)] += jax.lax.dot_general(
                xc, t_buf[buf],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        return 0

    jax.lax.fori_loop(0, pairs, body, 0)


@functools.partial(jax.jit, static_argnames=("n_out_padded", "interpret"))
def block_ell_matmul_xres2(x_padded, tiles, tile_ids, col_blk, n_out_padded,
                           interpret=False):
    """Pair-depth variant of block_ell_matmul_xres (same contract)."""
    B = x_padded.shape[0]
    n_rb, KB = tile_ids.shape
    TM, TN = tiles.shape[1], tiles.shape[2]
    n_grp = -(-n_rb // GROUP)
    pad_r = n_grp * GROUP - n_rb
    pad_k = KB % 2
    if pad_r or pad_k:
        tile_ids = jnp.pad(tile_ids, ((0, pad_r), (0, pad_k)))
        col_blk = jnp.pad(col_blk, ((0, pad_r), (0, pad_k)))
    from ..globals import kernel_precision as _prec
    dt = tiles.dtype
    prec = _prec() if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    kernel = functools.partial(_kernel_xres2, precision=prec)
    KBP = KB + pad_k
    y = pl.pallas_call(
        kernel,
        grid=(n_grp,),
        in_specs=[
            pl.BlockSpec((GROUP, KBP), lambda r: (r, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GROUP, KBP), lambda r: (r, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((B, GROUP * TM), lambda r: (0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_grp * GROUP * TM), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NBUF, TM, 2 * TN), dt),
            pltpu.SemaphoreType.DMA((2, NBUF)),
        ],
        interpret=interpret,
    )(tile_ids, col_blk, x_padded.astype(dt), tiles)
    return y[:, :n_out_padded]


def _kernel_xresd(tile_ids_ref, col_blk_ref,  # SMEM (GROUP, KBP) padded to D
                  x_vmem, tiles_hbm,
                  out_ref, t_buf, sems, precision, depth):
    """Depth-D generalization of the pair-depth kernel (_kernel_xres2): D
    slots of the same row-block fuse into ONE (B, D*TN) x (TM, D*TN) dot.
    VERDICT round-4 #6 asks where the knee is — depth amortizes the ~0.07
    us/slot issue/loop overhead over D slots but multiplies the per-step DMA
    fan-out (D tile copies per buffer) and the VMEM tile footprint
    (NBUF*TM*D*TN), so past the knee the pipeline stalls on DMA issue.
    Measured sweep: scripts/bench_pallas_kernel.py --depth-sweep."""
    KBP = tile_ids_ref.shape[1]
    TN = t_buf.shape[2] // depth
    TM = t_buf.shape[1]
    steps = GROUP * (KBP // depth)

    def copies(sp, buf):
        j, q = sp // (KBP // depth), sp % (KBP // depth)
        return [pltpu.make_async_copy(
                    tiles_hbm.at[tile_ids_ref[j, depth * q + d]],
                    t_buf.at[buf, :, pl.ds(d * TN, TN)],
                    sems.at[d, buf])
                for d in range(depth)]

    for s0 in range(NBUF - 1):
        @pl.when(s0 < steps)
        def _(s0=s0):
            for c in copies(s0, s0 % NBUF):
                c.start()

    out_ref[...] = jnp.zeros_like(out_ref)

    def body(sp, _):
        buf = sp % NBUF

        @pl.when(sp + NBUF - 1 < steps)
        def _():
            for c in copies(sp + NBUF - 1, (sp + NBUF - 1) % NBUF):
                c.start()

        for c in copies(sp, buf):
            c.wait()
        j, q = sp // (KBP // depth), sp % (KBP // depth)

        nz = tile_ids_ref[j, depth * q] > 0
        for d in range(1, depth):
            nz = nz | (tile_ids_ref[j, depth * q + d] > 0)

        @pl.when(nz)
        def _():
            xc = jnp.concatenate(
                [x_vmem[:, pl.ds(col_blk_ref[j, depth * q + d] * TN, TN)]
                 for d in range(depth)], axis=1)
            out_ref[:, pl.ds(j * TM, TM)] += jax.lax.dot_general(
                xc, t_buf[buf],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


@functools.partial(jax.jit, static_argnames=("n_out_padded", "depth",
                                             "interpret"))
def block_ell_matmul_xresd(x_padded, tiles, tile_ids, col_blk, n_out_padded,
                           depth=4, interpret=False):
    """Depth-D variant of block_ell_matmul_xres (same contract); depth=2
    reproduces block_ell_matmul_xres2's schedule via the generic kernel."""
    B = x_padded.shape[0]
    n_rb, KB = tile_ids.shape
    TM, TN = tiles.shape[1], tiles.shape[2]
    n_grp = -(-n_rb // GROUP)
    pad_r = n_grp * GROUP - n_rb
    pad_k = (-KB) % depth
    if pad_r or pad_k:
        tile_ids = jnp.pad(tile_ids, ((0, pad_r), (0, pad_k)))
        col_blk = jnp.pad(col_blk, ((0, pad_r), (0, pad_k)))
    from ..globals import kernel_precision as _prec
    dt = tiles.dtype
    prec = _prec() if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    kernel = functools.partial(_kernel_xresd, precision=prec, depth=depth)
    KBP = KB + pad_k
    y = pl.pallas_call(
        kernel,
        grid=(n_grp,),
        in_specs=[
            pl.BlockSpec((GROUP, KBP), lambda r: (r, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GROUP, KBP), lambda r: (r, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((B, GROUP * TM), lambda r: (0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_grp * GROUP * TM), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NBUF, TM, depth * TN), dt),
            pltpu.SemaphoreType.DMA((depth, NBUF)),
        ],
        interpret=interpret,
    )(tile_ids, col_blk, x_padded.astype(dt), tiles)
    return y[:, :n_out_padded]


def _kernel_grid(ids_ref, cb_ref,   # scalar-prefetch (n_rb, KB) index arrays
                 x_blk,             # VMEM (B, TN): x block col_blk[r,k], pipelined
                 tile_blk,          # VMEM (1, TM, TN): tiles[tile_ids[r,k]], pipelined
                 out_blk,           # VMEM (B, TM): row-block r, revisited over k
                 precision):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_blk[...] = jnp.zeros_like(out_blk)

    @pl.when(ids_ref[pl.program_id(0), k] > 0)  # tile 0 = zero padding
    def _():
        out_blk[...] += jax.lax.dot_general(
            x_blk[...], tile_blk[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)


@functools.partial(jax.jit, static_argnames=("n_out_padded", "interpret"))
def block_ell_matmul_grid(x_padded, tiles, tile_ids, col_blk, n_out_padded,
                          interpret=False):
    """Grid-pipelined slot walk (same contract as block_ell_matmul): the grid
    is (n_rb, KB) and the tile / x-block DMAs are driven by scalar-prefetched
    index maps, so Mosaic's own pipeline does the double-buffering, overlaps
    output write-back, and SKIPS the copy when consecutive steps reference
    the same tile id (free dedup for periodic/grouped real layers).  The
    hand-rolled DMA variants pay ~0.25 us/slot of scalar-core descriptor
    issue + loop overhead regardless of dtype; this one leaves all of that
    to the pipeline machinery."""
    B = x_padded.shape[0]
    n_rb, KB = tile_ids.shape
    TM, TN = tiles.shape[1], tiles.shape[2]
    from ..globals import kernel_precision as _prec
    dt = tiles.dtype
    prec = _prec() if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    kernel = functools.partial(_kernel_grid, precision=prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rb, KB),
        in_specs=[
            pl.BlockSpec((B, TN), lambda r, k, ids, cb: (0, cb[r, k]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, TN), lambda r, k, ids, cb: (ids[r, k], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TM), lambda r, k, ids, cb: (0, r),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_rb * TM), jnp.float32),
        interpret=interpret,
    )(tile_ids, col_blk, x_padded.astype(dt), tiles)
    return y[:, :n_out_padded]


PGROUP = 8  # period rows per grid step (TPU SMEM blocks need 8-row alignment)


def _periodic_kernel(col_ref,   # SMEM (1, PGROUP, KB): cols of rows rho0..+8 at rep j
                     ids_ref,   # SMEM (n_grp*PGROUP, KB): ALL period tile ids
                     x_vmem,    # VMEM (B, n_cb*TN) resident input
                     tiles_hbm,  # HBM (n_uniq, TM, TN)
                     out_ref,   # VMEM (B, PGROUP*TM) output block
                     t_buf, sems, precision):
    """Tile-resident periodic Block-ELL matvec: grid (P/PGROUP, R), rep axis
    innermost.  A group's PGROUP*KB tiles are DMA'd once and stay in VMEM for
    all R repetitions; x is fully VMEM-resident, so HBM traffic is exactly
    ONE read of the period's tile set (plus the small output) — the
    small-batch serving roofline (docs/SERVING.md).  With more than one
    group, tile buffers are double-buffered: group g+1's DMAs start at
    (g, j==0) and overlap all R repetitions of group g's compute, so the
    group-boundary transfer wait disappears (round-3 VERDICT #4).  Zero-tile
    slots (id 0, including rows padding P up to PGROUP) are skipped."""
    KB = ids_ref.shape[1]
    NGB = t_buf.shape[0]             # tile-buffer depth: min(2, n_grp)
    TM = t_buf.shape[3]
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_grp = pl.num_programs(0)

    def group_copies(gi, buf, do):
        for gg in range(PGROUP):     # static unroll: PGROUP*KB tile DMAs
            for k in range(KB):
                c = pltpu.make_async_copy(
                    tiles_hbm.at[ids_ref[gi * PGROUP + gg, k]],
                    t_buf.at[buf, gg, k], sems.at[buf, gg, k])
                c.start() if do == "start" else c.wait()

    @pl.when(j == 0)
    def _():
        if NGB == 1:                 # static: no prefetch — load in place
            group_copies(g, 0, "start")
        else:
            @pl.when(g == 0)
            def _():
                group_copies(0, 0, "start")
        group_copies(g, g % NGB, "wait")
        if NGB > 1:                  # static: prefetch only when 2 buffers
            @pl.when(g + 1 < n_grp)
            def _():
                group_copies(g + 1, (g + 1) % NGB, "start")

    buf = g % NGB
    out_ref[...] = jnp.zeros_like(out_ref)
    for gg in range(PGROUP):
        for k in range(KB):          # static unroll over the group's slots
            tid = ids_ref[g * PGROUP + gg, k]

            @pl.when(tid > 0)
            def _(gg=gg, k=k):
                cb = col_ref[0, gg, k]
                xb = x_vmem[:, pl.ds(cb * (t_buf.shape[4]), t_buf.shape[4])]
                out_ref[:, pl.ds(gg * TM, TM)] += jax.lax.dot_general(
                    xb, t_buf[buf, gg, k],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)


@functools.partial(jax.jit, static_argnames=("s", "P", "R", "interpret"))
def periodic_block_ell_matvec(x_padded, tiles, tile_ids, col_blk, s, P, R,
                              interpret=False):
    """Periodic mid-section apply for small batches: rows [s, s+P*R) of a
    row-block-periodic Block-ELL operator (tile_ids[s+rho+j*P] ==
    tile_ids[s+rho]).  Requires x (B, n_cb*TN) to fit VMEM (caller gates).
    Returns (B, P*R*TM) f32 for the mid-section only."""
    B = x_padded.shape[0]
    KB = tile_ids.shape[1]
    TM, TN = tiles.shape[1], tiles.shape[2]
    P8 = -(-P // PGROUP) * PGROUP
    # pre-slice + pad the mid-section index arrays so SMEM blocks are
    # (PGROUP, KB)-aligned regardless of s/P alignment; pad rows hit tile 0
    ids_mid = jnp.pad(tile_ids[s:s + P], ((0, P8 - P), (0, 0)))
    cols_mid = jnp.pad(col_blk[s:s + P * R].reshape(R, P, KB),
                       ((0, 0), (0, P8 - P), (0, 0)))
    from ..globals import kernel_precision as _prec
    dt = tiles.dtype
    prec = _prec() if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    kernel = functools.partial(_periodic_kernel, precision=prec)
    n_grp = P8 // PGROUP
    ngb = min(2, n_grp)  # double-buffer group tiles only when >1 group
    y = pl.pallas_call(
        kernel,
        grid=(n_grp, R),
        in_specs=[
            pl.BlockSpec((1, PGROUP, KB), lambda g, j: (j, g, 0),
                         memory_space=pltpu.SMEM),          # col rows (rep j)
            pl.BlockSpec((P8, KB), lambda g, j: (0, 0),
                         memory_space=pltpu.SMEM),  # ALL period tile ids (tiny)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # x resident
            pl.BlockSpec(memory_space=pltpu.ANY),           # tiles in HBM
        ],
        out_specs=pl.BlockSpec((B, PGROUP * TM),
                               lambda g, j: (0, j * (P8 // PGROUP) + g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R * P8 * TM), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ngb, PGROUP, KB, TM, TN), dt),
            pltpu.SemaphoreType.DMA((ngb, PGROUP, KB)),
        ],
        interpret=interpret,
    )(cols_mid, ids_mid, x_padded.astype(dt), tiles)
    if P8 != P:  # strip the group padding: (B, R, P8*TM) -> (B, R*P*TM)
        y = y.reshape(B, R, P8 * TM)[:, :, :P * TM].reshape(B, R * P * TM)
    return y
