"""Probe: can Mosaic lower a vectorized in-kernel VMEM gather, and at what
rate?  The stochastic VGG-224 B=1 floor is the thin EllOp factors' XLA
gather fusions (~1.2 GB/s effective, docs/SERVING.md round 3).  If a Pallas
kernel can gather x[cols] from a VMEM-resident x meaningfully faster, an
ELL-apply kernel is worth building; if Mosaic refuses to lower it (or it
runs at scalar rate), that settles the design the other way.

Strategies probed (each vs the XLA jnp.take baseline):
  a) in-kernel jnp.take of a VMEM-resident x with a VMEM index block
  b) in-kernel x_ref[idx] vector dynamic indexing (if supported)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_ell_gather_kernel.py
"""
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    n = 802_816            # conv2_1-scale x (64*112*112), 3.2 MB f32
    n_rows, K = 100_352, 16  # ELL: n_rows*K = 1.6M gathered elements
    x = rng.standard_normal(n).astype(np.float32)
    cols = rng.integers(0, n, size=(n_rows, K)).astype(np.int32)
    vals = rng.standard_normal((n_rows, K)).astype(np.float32)

    xd = jnp.asarray(x)
    cd = jnp.asarray(cols)
    vd = jnp.asarray(vals)

    # ---- XLA baseline: flat take + weighted reduce (EllOp small-B path) ----
    @jax.jit
    def xla_ell(x, cols, vals):
        xg = jnp.take(x, cols.reshape(-1)).reshape(cols.shape)
        return (xg * vals).sum(axis=1)

    def timeit(f, *a, reps=20):
        y = jax.block_until_ready(f(*a))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(reps):
                y = f(*a)
            jax.block_until_ready(y)
            ts.append((time.perf_counter() - t0) / reps)
        return float(np.median(ts)), y

    t_xla, y_ref = timeit(xla_ell, xd, cd, vd)
    nel = n_rows * K
    print("[xla-take]   %.3f ms  %.1f Melem/s  (%.2f GB/s effective idx+val+x)"
          % (1e3 * t_xla, nel / t_xla / 1e6, nel * 12 / t_xla / 1e9), flush=True)

    # ---- Pallas: rows blocked, x resident in VMEM, jnp.take inside --------
    RB = 2048  # rows per grid step

    def kernel_take(x_ref, cols_ref, vals_ref, out_ref):
        xv = x_ref[...]                      # (1, n) VMEM-resident
        idx = cols_ref[...]                  # (RB, K)
        xg = jnp.take(xv[0], idx.reshape(-1), axis=0).reshape(idx.shape)
        out_ref[...] = (xg * vals_ref[...]).sum(axis=1, keepdims=True)

    @jax.jit
    def pallas_ell(x, cols, vals):
        return pl.pallas_call(
            kernel_take,
            grid=(n_rows // RB,),
            in_specs=[
                pl.BlockSpec((1, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, K), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, K), lambda r: (r, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, 1), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
        )(x[None, :], cols, vals)[:, 0]

    try:
        t_pal, y_pal = timeit(pallas_ell, xd, cd, vd)
        err = float(jnp.abs(y_pal - y_ref).max())
        print("[pallas-take] %.3f ms  %.1f Melem/s  err %.2g"
              % (1e3 * t_pal, nel / t_pal / 1e6, err), flush=True)
    except Exception as e:
        print("[pallas-take] FAILED to lower: %r" % (str(e)[:500],), flush=True)


if __name__ == "__main__":
    main()
