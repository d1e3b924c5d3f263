"""Pallas TPU kernel for Block-ELL sparse x dense-batch matmul.

The XLA fallback in operators.BlockSparseOp.apply materializes a gathered
intermediate xg of shape (B, n_rb, KB, TN) in HBM before the batched einsum.
This kernel instead walks each output row-block's tile list with
scalar-prefetched indices: the tile (tile_ids[r,k]) and the x column-block
(col_blk[r,k]) are DMA'd HBM->VMEM per slot and accumulated on the MXU, so
HBM traffic is exactly tiles-touched + x-blocks-touched.

Layout convention matches BlockSparseOp: y[:, rTM:(r+1)TM] =
sum_k x[:, col_blk[r,k]*TN : +TN] @ tiles[tile_ids[r,k]]^T.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tile_ids_ref, col_blk_ref,    # scalar-prefetch (SMEM)
            x_hbm, tiles_hbm,             # HBM operands
            out_ref,                      # VMEM output block (B, TM)
            x_buf, t_buf, acc, sems, precision):
    r = pl.program_id(0)
    KB = tile_ids_ref.shape[1]
    acc[...] = jnp.zeros_like(acc)

    def slot(k, _):
        tid = tile_ids_ref[r, k]
        cb = col_blk_ref[r, k]
        cp_x = pltpu.make_async_copy(x_hbm.at[:, pl.ds(cb * x_buf.shape[1], x_buf.shape[1])],
                                     x_buf, sems.at[0])
        cp_t = pltpu.make_async_copy(tiles_hbm.at[tid], t_buf, sems.at[1])
        cp_x.start()
        cp_t.start()
        cp_x.wait()
        cp_t.wait()
        # skip the zero padding tile (id 0) cheaply via predication
        @pl.when(tid > 0)
        def _():
            acc[...] += jax.lax.dot_general(
                x_buf[...], t_buf[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
        return 0

    jax.lax.fori_loop(0, KB, slot, 0)
    out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("n_out_padded", "interpret"))
def block_ell_matmul(x_padded, tiles, tile_ids, col_blk, n_out_padded,
                     interpret=False):
    """x_padded: (B, n_cb*TN) f32; tiles: (n_uniq, TM, TN); tile_ids/col_blk:
    (n_rb, KB) int32.  Returns (B, n_out_padded) f32."""
    B = x_padded.shape[0]
    n_rb, KB = tile_ids.shape
    TM, TN = tiles.shape[1], tiles.shape[2]
    from ..globals import precision as _prec
    precision = _prec()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((B, TM), lambda r, *_: (0, r),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, TN), jnp.float32),
            pltpu.VMEM((TM, TN), jnp.float32),
            pltpu.VMEM((B, TM), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, precision=precision)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_out_padded), jnp.float32),
        interpret=interpret,
    )(tile_ids, col_blk, x_padded, tiles)
