"""Measure Block-ELL kernel throughput vs DMA pipeline depth on the real TPU.

Synthetic op shaped like a VGG conv5 keyed layer: n_rb=784, KB=40, 27K unique
tiles (1.7 GB) — the B=1 serving regime is DMA-latency bound.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from keynet_tpu.ops import pallas_kernels as pk

rng = np.random.default_rng(0)
TM = TN = 128
n_rb, KB, n_uniq = 784, 40, 27_000
tiles = jnp.asarray(rng.standard_normal((n_uniq, TM, TN)).astype(np.float32))
tile_ids = jnp.asarray(rng.integers(1, n_uniq, size=(n_rb, KB)).astype(np.int32))
col_blk = jnp.asarray(rng.integers(0, n_rb, size=(n_rb, KB)).astype(np.int32))
bytes_touched = n_rb * KB * (TM * TN * 4)  # tiles re-DMA'd per slot

for B in (1, 8, 128):
    x = jnp.asarray(rng.standard_normal((B, n_rb * TN)).astype(np.float32))
    y = pk.block_ell_matmul(x, tiles, tile_ids, col_blk, n_rb * TM)
    y.block_until_ready()
    t0 = time.time(); n = 5
    for _ in range(n):
        y = pk.block_ell_matmul(x, tiles, tile_ids, col_blk, n_rb * TM)
    y.block_until_ready()
    dt = (time.time() - t0) / n
    flops = 2 * n_rb * KB * TM * TN * B
    print("B=%4d  %7.2f ms  %6.1f GB/s tile-DMA  %6.2f TFLOP/s"
          % (B, dt * 1e3, bytes_touched / dt / 1e9, flops / dt / 1e12))
