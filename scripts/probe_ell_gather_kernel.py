"""Probe: faster B=1 ELL apply formulations on the real chip.

The stochastic VGG-224 B=1 device floor is two thin-factor gathers
(conv2_1.F2: 85 ms for 12.8M gathered elements from a 3.2 MB operand —
~0.15 elem/cycle, the scalar-gather rate; see docs/SERVING.md round 4).
At B=1 each gathered element is a lone scalar, so the VPU's 128 lanes idle.
These probes refill the lanes: split the flat index into (row, lane) over an
(n/128, 128) view, row-gather whole 128-lane rows (fast on TPU), and select
the lane arithmetically.

Timing: K-chained fori_loop with a data dependency (defeats the tunnel's
identical-dispatch caching; CLAUDE.md) and slope between two K values.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_ell_gather_kernel.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    # conv2_1.F2 regime: square thin factor, n rows x K=16
    n = 802_816
    K = 16
    cols = rng.integers(0, n, size=(n, K)).astype(np.int32)
    vals = (rng.standard_normal((n, K)) / np.sqrt(K)).astype(np.float32)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    cd = jnp.asarray(cols)
    vd = jnp.asarray(vals)
    r_idx = jnp.asarray((cols // 128).astype(np.int32))   # (n, K)
    l_idx = jnp.asarray((cols % 128).astype(np.int32))    # (n, K)

    def v0_take(x):
        xg = jnp.take(x, cd.reshape(-1)).reshape(n, K)
        return jnp.einsum("nk,nk->n", xg, vd)

    def v1_rowgather_onehot(x):
        x2 = x.reshape(n // 128, 128)
        xr = jnp.take(x2, r_idx.reshape(-1), axis=0)      # (n*K, 128) row gather
        oh = l_idx.reshape(-1)[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (n * K, 128), 1)
        el = jnp.where(oh, xr, 0.0).sum(axis=1).reshape(n, K)
        return jnp.einsum("nk,nk->n", el, vd)

    def v2_rowgather_tala(x):
        x2 = x.reshape(n // 128, 128)
        xr = jnp.take(x2, r_idx.reshape(-1), axis=0)      # (n*K, 128)
        el = jnp.take_along_axis(xr, l_idx.reshape(-1, 1), axis=1)[:, 0]
        return jnp.einsum("nk,nk->n", el.reshape(n, K), vd)

    variants = [("v0-take", v0_take), ("v1-row+onehot", v1_rowgather_onehot),
                ("v2-row+tala", v2_rowgather_tala)]

    y_ref = None
    K1, K2, trials = 2, 22, 5
    for name, f in variants:
        def chain(x, KK, f=f):
            def body(i, x):
                y = f(x)
                # renormalized feedback keeps the chain data-dependent
                return y / jnp.sqrt(jnp.mean(y * y) + 1e-9)
            return jax.lax.fori_loop(0, KK, body, x)
        try:
            y1 = jax.block_until_ready(jax.jit(f)(x0))
        except Exception as e:
            print("[%s] FAILED: %r" % (name, str(e)[:300]), flush=True)
            continue
        if y_ref is None:
            y_ref = np.asarray(y1)
        else:
            err = float(np.abs(np.asarray(y1) - y_ref).max())
            assert err < 1e-4 * max(1.0, float(np.abs(y_ref).max())), (name, err)
        chains = {KK: jax.jit(chain, static_argnums=1) for KK in (K1, K2)}
        times = {K1: [], K2: []}
        for KK in (K1, K2):
            chains[KK](x0, KK).block_until_ready()
            for _ in range(trials):
                t0 = time.perf_counter()
                chains[KK](x0, KK).block_until_ready()
                times[KK].append(time.perf_counter() - t0)
        per = (np.median(times[K2]) - np.median(times[K1])) / (K2 - K1)
        print("[%s] %8.3f ms/apply  %6.1f Melem/s" %
              (name, 1e3 * per, n * K / per / 1e6), flush=True)

    # ---- batched: transposed row-gather vs the EllOp batch paths -----------
    # xT (n, B): each ELL entry gathers one CONTIGUOUS lane-row that serves
    # every batch element at once; one formulation covers B=1..128.
    def vT_rowgather(xT):
        xr = jnp.take(xT, cd.reshape(-1), axis=0)         # (n*K, B) row gather
        return jnp.einsum("nkb,nk->nb", xr.reshape(n, K, -1), vd)

    def vb_flat(xB):                                       # EllOp small-B path
        xg = jnp.take(xB, cd.reshape(-1), axis=1).reshape(xB.shape[0], n, K)
        return jnp.einsum("bnk,nk->bn", xg, vd)

    def vb_unroll(xB):                                     # EllOp mid-B path
        y = jnp.zeros((xB.shape[0], n), dtype=jnp.float32)
        for k in range(K):
            y = y + vd[:, k][None, :] * jnp.take(xB, cd[:, k], axis=1)
        return y

    for B in (1, 8, 32):
        xB0 = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
        base = None
        for name, f, transposed in (("vT-rowgather", vT_rowgather, True),
                                    ("vb-flat", vb_flat, False),
                                    ("vb-unroll", vb_unroll, False)):
            if name == "vb-flat" and B * n * K * 4 > (512 << 20):
                print("[B=%3d %s] skipped (gather bytes gate)" % (B, name),
                      flush=True)
                continue

            def chain(x, KK, f=f, transposed=transposed):
                def body(i, x):                            # carry (B, n): the
                    if transposed:                         # net's native shape
                        y = f(x.T).T                       # vT pays both
                    else:                                  # boundary transposes
                        y = f(x)
                    return y / jnp.sqrt(jnp.mean(y * y) + 1e-9)
                return jax.lax.fori_loop(0, KK, body, x)

            y1 = np.asarray(jax.jit(f)(xB0.T if transposed else xB0))
            y1 = y1.T if transposed else y1
            if base is None:
                base = y1
            else:
                err = np.abs(y1 - base).max()
                assert err < 1e-4 * max(1.0, np.abs(base).max()), (name, err)
            chains = {KK: jax.jit(chain, static_argnums=1) for KK in (K1, K2)}
            times = {K1: [], K2: []}
            for KK in (K1, K2):
                chains[KK](xB0, KK).block_until_ready()
                for _ in range(trials):
                    t0 = time.perf_counter()
                    chains[KK](xB0, KK).block_until_ready()
                    times[KK].append(time.perf_counter() - t0)
            per = (np.median(times[K2]) - np.median(times[K1])) / (K2 - K1)
            print("[B=%3d %s] %8.3f ms/apply  (%5.2f ms/img)" %
                  (B, name, 1e3 * per, 1e3 * per / B), flush=True)


if __name__ == "__main__":
    main()
