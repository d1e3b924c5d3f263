"""On-chip microbenchmark of EllOp apply formulations.

The B=32 stochastic VGG-224 device trace (docs/SERVING.md) shows ~440 ms of
per-slot gather fusions from EllOp.apply's unrolled path: with x in (B, n)
layout, every gathered index touches B strided HBM transactions (4 useful
bytes of each 512 B line), so the 16 slot gathers of the conv1/conv2 mask
factors move ~13 GB per layer.  This bench compares, at the real layer
shapes, the candidate formulations:

  slot    unrolled per-slot gathers on (B, n)          [current large-B path]
  flat    one (B, n*K) gather + einsum reduce          [current small-B path]
  flatT   one (n*K, B) gather on transposed x + reduce [B-minor transactions]
  slotT   per-slot gathers on transposed (n, B) x

Each timing cycles through distinct x buffers (identical repeated dispatches
through the axon tunnel read absurdly fast — CLAUDE.md), and asserts every
variant matches the slot formulation to 1e-4.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ell_gather.py \
      [--n 802816] [--k 16] [--batches 1,8,32]
"""
import argparse
import time

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=802816)
ap.add_argument("--k", type=int, default=16)
ap.add_argument("--batches", default="1,8,32")
ap.add_argument("--reps", type=int, default=8)
args = ap.parse_args()

import jax
import jax.numpy as jnp

n, K = args.n, args.k
rng = np.random.default_rng(0)
cols = rng.integers(0, n, size=(n, K), dtype=np.int32)
vals = (rng.standard_normal((n, K)) / np.sqrt(K)).astype(np.float32)
cols_d = jnp.asarray(cols)
vals_d = jnp.asarray(vals)
flat_d = jnp.asarray(cols.reshape(-1))


@jax.jit
def f_slot(x):
    y = jnp.zeros((x.shape[0], n), dtype=jnp.float32)
    for k in range(K):
        y = y + vals_d[:, k][None, :] * jnp.take(x, cols_d[:, k], axis=1)
    return y


@jax.jit
def f_flat(x):
    xg = jnp.take(x, flat_d, axis=1).reshape(x.shape[0], n, K)
    return jnp.einsum("bnk,nk->bn", xg, vals_d,
                      preferred_element_type=jnp.float32)


@jax.jit
def f_flatT(x):
    xT = x.T  # (n, B)
    xg = jnp.take(xT, flat_d, axis=0).reshape(n, K, x.shape[0])
    return jnp.einsum("nkb,nk->bn", xg, vals_d,
                      preferred_element_type=jnp.float32)


@jax.jit
def f_slotT(x):
    xT = x.T  # (n, B)
    yT = jnp.zeros((n, x.shape[0]), dtype=jnp.float32)
    for k in range(K):
        yT = yT + vals_d[:, k][:, None] * jnp.take(xT, cols_d[:, k], axis=0)
    return yT.T


VARIANTS = [("slot", f_slot), ("flat", f_flat),
            ("flatT", f_flatT), ("slotT", f_slotT)]

print("devices: %s   n=%d K=%d" % (jax.devices(), n, K), flush=True)
for B in [int(b) for b in args.batches.split(",")]:
    xs = [jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
          for _ in range(3)]
    ref = np.asarray(f_slot(xs[0]))
    rows = []
    for name, fn in VARIANTS:
        try:
            y = jax.block_until_ready(fn(xs[0]))  # compile + warm
        except Exception as e:
            print("  B=%-3d %-6s FAILED: %s" % (B, name, str(e)[:80]), flush=True)
            continue
        err = float(np.abs(np.asarray(y) - ref).max())
        t0 = time.perf_counter()
        for i in range(args.reps):
            y = fn(xs[i % len(xs)])
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / args.reps
        rows.append((name, dt, err))
        print("  B=%-3d %-6s %8.2f ms   err %.2e" % (B, name, 1e3 * dt, err),
              flush=True)
    best = min(rows, key=lambda r: r[1])
    print("B=%-3d best: %s (%.2f ms)" % (B, best[0], 1e3 * best[1]), flush=True)
