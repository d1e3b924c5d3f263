"""Isolated on-chip benchmark of the Pallas Block-ELL kernel (VERDICT #8).

The axon tunnel caches repeated identical dispatches (CLAUDE.md), so naive
microbenchmarks read absurdly fast.  This harness defeats that by cycling
through NX distinct pre-uploaded x operands and timing a long dependent-free
sequence of dispatches, reporting per-call time after subtracting a measured
empty-dispatch floor.  It reports achieved HBM bandwidth against the slot-DMA
roofline (each slot moves one (TM,TN) tile + one (B,TN) x block).

Run on the TPU box:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pallas_kernel.py
"""

import time
import sys

import numpy as np
import scipy.sparse


def main():
    import jax
    import jax.numpy as jnp
    from keynet_tpu.ops.operators import BlockSparseOp
    from keynet_tpu.ops.pallas_kernels import block_ell_matmul

    assert jax.default_backend() == "tpu", "run on the TPU box"
    rng = np.random.default_rng(0)

    # synthetic Block-ELL in the VGG-conv regime: 128 row-blocks, KB=9 slots
    # each, 400 unique dense tiles (poor dedup -> every slot re-DMAs)
    n_rb, KB, n_uniq, TM, TN = 128, 9, 400, 128, 128
    tiles = rng.normal(size=(n_uniq, TM, TN)).astype(np.float32)
    tiles[0] = 0.0
    tile_ids = rng.integers(1, n_uniq, size=(n_rb, KB)).astype(np.int32)
    n_cb = 256
    col_blk = rng.integers(0, n_cb, size=(n_rb, KB)).astype(np.int32)

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        t_dev = jnp.asarray(tiles, dtype=dtype)
        ids_dev = jnp.asarray(tile_ids)
        cb_dev = jnp.asarray(col_blk)
        for B in (8, 64, 128):
            xs = [jnp.asarray(rng.normal(size=(B, n_cb * TN)).astype(np.float32))
                  for _ in range(8)]
            # correctness vs einsum (on-chip, every operand)
            y0 = np.asarray(block_ell_matmul(xs[0], t_dev, ids_dev, cb_dev,
                                             n_rb * TM))
            xg = xs[0].astype(dtype).reshape(B, n_cb, TN)[:, col_blk]
            # HIGHEST so the reference accumulates in f32 like the kernel
            # (default MXU bf16 passes would make the REFERENCE the noisy one)
            ye = np.asarray(jnp.einsum(
                "brkn,rkmn->brm", xg, t_dev[tile_ids],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).reshape(B, -1))
            err = np.abs(y0 - ye).max() / max(1.0, np.abs(ye).max())
            assert err < 1e-3, err

            # empty-dispatch floor: a trivial jitted op on the same operand set
            tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
            for x in xs:
                tiny(x)
            t0 = time.perf_counter()
            reps = 40
            for i in range(reps):
                y = tiny(xs[i % len(xs)])
            jax.block_until_ready(y)
            floor = (time.perf_counter() - t0) / reps

            # kernel timing over varying operands
            for x in xs:
                block_ell_matmul(x, t_dev, ids_dev, cb_dev, n_rb * TM)
            t0 = time.perf_counter()
            for i in range(reps):
                y = block_ell_matmul(xs[i % len(xs)], t_dev, ids_dev, cb_dev,
                                     n_rb * TM)
            jax.block_until_ready(y)
            per = (time.perf_counter() - t0) / reps - floor

            it = 2 if dtype == jnp.bfloat16 else 4
            slot_bytes = n_rb * KB * (TM * TN + B * TN) * it
            flops = 2 * n_rb * KB * B * TM * TN
            print("[pallas-%s] B=%4d  %7.3f ms/call (floor %5.2f ms)  "
                  "%6.1f GB/s slot-DMA  %6.2f TFLOP/s  err %.2g"
                  % (name, B, 1e3 * per, 1e3 * floor,
                     slot_bytes / per / 1e9, flops / per / 1e12, err),
                  flush=True)


if __name__ == "__main__":
    main()
