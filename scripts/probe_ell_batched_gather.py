"""Probe: mid-batch ELL apply formulations on the real chip (round-5
VERDICT #1/#2 — the B=8 regime is the worst per-image point and B=32's
padded transposed row-gather is the serving residual).

Candidate: GROUPED-LANE packing.  For B | 128, pack x^T into an
(ceil(n/g), g*B) array with g = 128 // B — lane l = (subgroup u, batch b),
u = l // B.  One 128-lane row-gather then serves ALL batch elements of one
ELL entry, and the operand is g x smaller than the (n, 128) padded
transposed layout (B=8: 26 MB vs 411 MB; B=32: 103 MB) — the B=1 probe
showed gather rate rises ~2.7x when the operand is small.  The in-lane
select over g subgroups is VPU work.

Timing: K-chained fori_loop with a renormalized data dependency (defeats
the tunnel's identical-dispatch caching; CLAUDE.md) and slope between two
chain lengths.  The index/value arrays are passed as jit ARGUMENTS —
closure-embedded 51 MB constants wedge the axon tunnel's remote_compile
(HTTP 413; CLAUDE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/probe_ell_batched_gather.py [8,32] [flat,padT,grp-where,grp-dot]
"""
import sys
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
    cd = jnp.asarray(cols)
    vd = jnp.asarray(vals)

    def flat_gather(x, cd, vd):
        """current 2<=B<=8 regime: one flat (B, n, K) gather"""
        B = x.shape[0]
        xg = jnp.take(x, cd.reshape(-1), axis=1).reshape(B, n, K)
        return jnp.einsum("bnk,nk->bn", xg, vd,
                          preferred_element_type=jnp.float32)

    def padded_transposed(x, cd, vd, Rc=4_000_000):
        """current 8<B<=128 regime: (n,128)-padded xT row-gather"""
        B = x.shape[0]
        xT = jax.lax.optimization_barrier(
            jnp.pad(x.T, ((0, 0), (0, 128 - B)))) if B < 128 else x.T
        parts = []
        Rc = max(1, min(n, Rc // K))
        for r0 in range(0, n, Rc):
            cf = cd[r0:r0 + Rc].reshape(-1)
            xr = jnp.take(xT, cf, axis=0)
            y128 = jnp.einsum("nkb,nk->bn", xr.reshape(-1, K, xr.shape[1]),
                              vd[r0:r0 + Rc], preferred_element_type=jnp.float32)
            parts.append(y128[:B])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    def grouped_lane(x, cd, vd, Rc=4_000_000):
        """candidate: (n/g, g*B) packed xT row-gather + in-lane subgroup select"""
        B = x.shape[0]
        g = 128 // B
        ng = -(-n // g)
        xt = x.T                                   # (n, B)
        pad = ng * g - n
        if pad:
            xt = jnp.pad(xt, ((0, pad), (0, 0)))
        xv = jax.lax.optimization_barrier(xt.reshape(ng, g * B))
        parts = []
        Rc = max(1, min(n, Rc // K))
        for r0 in range(0, n, Rc):
            cf = cd[r0:r0 + Rc].reshape(-1)
            xr = jnp.take(xv, cf // g, axis=0)     # (rc*K, 128)
            xr3 = xr.reshape(-1, g, B)
            oh = (cf % g)[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (xr.shape[0], g), 1)
            el = jnp.where(oh[:, :, None], xr3, 0.0).sum(axis=1)  # (rc*K, B)
            y = jnp.einsum("nkb,nk->bn", el.reshape(-1, K, B),
                           vd[r0:r0 + Rc], preferred_element_type=jnp.float32)
            parts.append(y)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    def grouped_lane_dot(x, cd, vd, Rc=4_000_000):
        """candidate: subgroup select via one-hot matmul instead of where+sum"""
        B = x.shape[0]
        g = 128 // B
        ng = -(-n // g)
        xt = x.T
        pad = ng * g - n
        if pad:
            xt = jnp.pad(xt, ((0, pad), (0, 0)))
        xv = jax.lax.optimization_barrier(xt.reshape(ng, g * B))
        parts = []
        Rc = max(1, min(n, Rc // K))
        for r0 in range(0, n, Rc):
            cf = cd[r0:r0 + Rc].reshape(-1)
            xr = jnp.take(xv, cf // g, axis=0)     # (rc*K, 128)
            oh = ((cf % g)[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (xr.shape[0], g), 1)).astype(jnp.float32)
            el = jnp.einsum("ngb,ng->nb", xr.reshape(-1, g, B), oh,
                            preferred_element_type=jnp.float32)
            y = jnp.einsum("nkb,nk->bn", el.reshape(-1, K, B),
                           vd[r0:r0 + Rc], preferred_element_type=jnp.float32)
            parts.append(y)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    def oracle(xh):
        # direct numpy ELL matvec (a scipy CSR build takes minutes of
        # first-touch page faults on this 1-vCPU host)
        return np.einsum("bnk,nk->bn", xh[:, cols], vals)

    batches = [int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1
                                else ["8", "32"])]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    K1, K2, trials = 1, 5, 3
    for B in batches:
        x0 = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
        ref = oracle(np.asarray(x0))
        variants = [("flat", flat_gather), ("padT", padded_transposed),
                    ("grp-where", grouped_lane), ("grp-dot", grouped_lane_dot)]
        if names:
            variants = [(nm, f) for nm, f in variants if nm in names]
        print("== B=%d ==" % B, flush=True)
        for name, f in variants:
            try:
                y1 = jax.block_until_ready(jax.jit(f)(x0, cd, vd))
            except Exception as e:
                print("[%s] FAILED: %r" % (name, str(e)[:240]), flush=True)
                continue
            err = float(np.abs(np.asarray(y1) - ref).max())
            assert err < 1e-3 * max(1.0, float(np.abs(ref).max())), (name, err)

            def chain(x, cd, vd, KK, f=f):
                def body(i, x):
                    y = f(x, cd, vd)
                    return y / jnp.sqrt(jnp.mean(y * y) + 1e-9)
                return jax.lax.fori_loop(0, KK, body, x)

            times = {}
            for KK in (K1, K2):
                fn = jax.jit(chain, static_argnums=3)
                jax.block_until_ready(fn(x0, cd, vd, KK))
                ts = []
                for _ in range(trials):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(x0, cd, vd, KK))
                    ts.append(time.perf_counter() - t0)
                times[KK] = float(np.median(ts))
            per = (times[K2] - times[K1]) / (K2 - K1)
            print("[%s] %.1f ms/apply  (%.2f ms/img)  err %.2g"
                  % (name, per * 1e3, per * 1e3 / B, err), flush=True)


if __name__ == "__main__":
    main()
