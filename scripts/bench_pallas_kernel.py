"""Isolated on-chip benchmark of the Pallas Block-ELL kernel (VERDICT #8).

The axon tunnel makes per-dispatch wall times useless: repeated identical
dispatches are cached (read absurdly fast) and single dispatches pay a
multi-ms roundtrip (read absurdly slow) — see CLAUDE.md.  This harness
defeats both by chaining K dependent kernel applications inside ONE jitted
``lax.fori_loop`` program and taking the slope between two K values: the
dispatch/roundtrip cost is identical for both programs and cancels, leaving
pure device time per kernel call.

The synthetic operand is square (n_cb == n_rb) so the kernel's output feeds
back as its input; tiles are scaled to unit spectral norm so activations
neither explode nor vanish across the chain.

It reports achieved HBM bandwidth against the slot-DMA roofline (each slot
moves one (TM,TN) tile + one (B,TN) x block).

Run on the TPU box:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pallas_kernel.py
"""

import sys
import time

import numpy as np


def depth_sweep():
    """Contraction-depth sweep of the x-resident slot kernel (round-4 VERDICT
    #6): D slots fuse into one (B, D*TN)x(TM, D*TN) dot.  Reports us/slot vs
    D so the knee is measured, not asserted."""
    import functools
    import jax
    import jax.numpy as jnp
    from keynet_tpu.ops.pallas_kernels import (block_ell_matmul_xres,
                                               block_ell_matmul_xres2,
                                               block_ell_matmul_xresd)

    assert jax.default_backend() == "tpu", "run on the TPU box"
    rng = np.random.default_rng(0)
    n_rb, KB, n_uniq, TM, TN = 128, 8, 400, 128, 128
    n_cb = n_rb
    tiles = (rng.normal(size=(n_uniq, TM, TN)) / np.sqrt(KB * TN)).astype(np.float32)
    tiles[0] = 0.0
    tile_ids = rng.integers(1, n_uniq, size=(n_rb, KB)).astype(np.int32)
    col_blk = rng.integers(0, n_cb, size=(n_rb, KB)).astype(np.int32)
    K1, K2, trials = 8, 264, 7
    slots = n_rb * KB

    variants = [("d1/xres", block_ell_matmul_xres),
                ("d2/xres2", block_ell_matmul_xres2)]
    for D in (2, 4, 8):
        variants.append(("d%d" % D,
                         functools.partial(block_ell_matmul_xresd, depth=D)))

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        t_dev = jnp.asarray(tiles, dtype=dtype)
        ids_dev = jnp.asarray(tile_ids)
        cb_dev = jnp.asarray(col_blk)
        for kname, kfn in variants:
            def chain(x, K, kfn=kfn):
                return jax.lax.fori_loop(
                    0, K, lambda i, x: kfn(x, t_dev, ids_dev, cb_dev,
                                           n_rb * TM), x)
            chains = {K: jax.jit(chain, static_argnums=1) for K in (K1, K2)}
            for B in (8, 128):
                x0 = jnp.asarray(rng.normal(size=(B, n_cb * TN)).astype(np.float32))
                y0 = np.asarray(kfn(x0, t_dev, ids_dev, cb_dev, n_rb * TM))
                xg = x0.astype(dtype).reshape(B, n_cb, TN)[:, col_blk]
                ye = np.asarray(jnp.einsum(
                    "brkn,rkmn->brm", xg, t_dev[tile_ids],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).reshape(B, -1))
                err = np.abs(y0 - ye).max() / max(1.0, np.abs(ye).max())
                assert err < 1e-3, (kname, err)
                times = {K1: [], K2: []}
                for K in (K1, K2):
                    chains[K](x0, K).block_until_ready()
                    for _ in range(trials):
                        t0 = time.perf_counter()
                        chains[K](x0, K).block_until_ready()
                        times[K].append(time.perf_counter() - t0)
                per = (np.median(times[K2]) - np.median(times[K1])) / (K2 - K1)
                print("[depth-%s-%s] B=%4d  %7.3f ms/call  %.3f us/slot  err %.2g"
                      % (name, kname, B, 1e3 * per, 1e6 * per / slots, err),
                      flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from keynet_tpu.ops.pallas_kernels import (block_ell_matmul,
                                               block_ell_matmul_xres,
                                               block_ell_matmul_xres2,
                                               block_ell_matmul_grid)

    assert jax.default_backend() == "tpu", "run on the TPU box"
    rng = np.random.default_rng(0)

    # synthetic Block-ELL in the VGG-conv regime: 128 row-blocks, KB=9 slots
    # each, 400 unique dense tiles (poor dedup -> every slot re-DMAs).
    # Square (n_cb == n_rb) so y chains back into x; ~unit-variance transfer.
    n_rb, KB, n_uniq, TM, TN = 128, 9, 400, 128, 128
    n_cb = n_rb
    tiles = (rng.normal(size=(n_uniq, TM, TN)) / np.sqrt(KB * TN)).astype(np.float32)
    tiles[0] = 0.0
    tile_ids = rng.integers(1, n_uniq, size=(n_rb, KB)).astype(np.int32)
    col_blk = rng.integers(0, n_cb, size=(n_rb, KB)).astype(np.int32)

    # chain lengths: the K2-K1 delta must dwarf the tunnel's ~34 ms roundtrip
    # jitter (K2-K1=32 gave >HBM-peak readings at fast configs — pure noise);
    # 256 extra calls x >=0.07 ms/call >= 18 ms of real device delta, and the
    # median over 7 trials rejects the host's 3x wall-clock weather
    K1, K2, trials = 8, 264, 7
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        t_dev = jnp.asarray(tiles, dtype=dtype)
        ids_dev = jnp.asarray(tile_ids)
        cb_dev = jnp.asarray(col_blk)

        for kfn, kname in ((block_ell_matmul, "hbm"),
                           (block_ell_matmul_xres, "xres"),
                           (block_ell_matmul_xres2, "xres2"),
                           (block_ell_matmul_grid, "grid")):
            def chain(x, K, kfn=kfn):
                def body(i, x):
                    return kfn(x, t_dev, ids_dev, cb_dev, n_rb * TM)
                return jax.lax.fori_loop(0, K, body, x)

            chains = {K: jax.jit(chain, static_argnums=1) for K in (K1, K2)}

            for B in (8, 64, 128):
                x0 = jnp.asarray(rng.normal(size=(B, n_cb * TN)).astype(np.float32))
                # correctness vs einsum (on-chip) for one application
                y0 = np.asarray(kfn(x0, t_dev, ids_dev, cb_dev, n_rb * TM))
                xg = x0.astype(dtype).reshape(B, n_cb, TN)[:, col_blk]
                # HIGHEST so the reference accumulates in f32 like the kernel
                # (default MXU bf16 passes would make the REFERENCE the noisy one)
                ye = np.asarray(jnp.einsum(
                    "brkn,rkmn->brm", xg, t_dev[tile_ids],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).reshape(B, -1))
                err = np.abs(y0 - ye).max() / max(1.0, np.abs(ye).max())
                assert err < 1e-3, err

                # slope timing: dispatch/tunnel cost is per-program and cancels
                times = {K1: [], K2: []}
                for K in (K1, K2):
                    chains[K](x0, K).block_until_ready()  # compile
                    for _ in range(trials):
                        t0 = time.perf_counter()
                        chains[K](x0, K).block_until_ready()
                        times[K].append(time.perf_counter() - t0)
                per = (np.median(times[K2]) - np.median(times[K1])) / (K2 - K1)

                it = 2 if dtype == jnp.bfloat16 else 4
                # slot-equivalent bytes: the naive roofline every slot-walk
                # pays (one tile + one x block per slot) — the figure of merit
                # vs the workload definition.  physical bytes: what the
                # variant actually moves through HBM (xres reads x ONCE).
                slot_bytes = n_rb * KB * (TM * TN + B * TN) * it
                phys_bytes = n_rb * KB * TM * TN * it + B * n_cb * TN * it \
                    if kname in ("xres", "xres2") else slot_bytes
                flops = 2 * n_rb * KB * B * TM * TN
                print("[pallas-%s-%s] B=%4d  %7.3f ms/call  %6.1f GB/s phys  "
                      "%6.1f GB/s slot-equiv  %6.2f TFLOP/s  err %.2g"
                      % (name, kname, B, 1e3 * per, phys_bytes / per / 1e9,
                         slot_bytes / per / 1e9, flops / per / 1e12, err),
                      flush=True)


if __name__ == "__main__":
    if "--depth-sweep" in sys.argv:
        depth_sweep()
    else:
        main()
