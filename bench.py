"""Benchmark: keyed LeNet_AvgPool forward throughput on TPU vs the reference's
CPU scipy.sparse execution model.

The reference runs keyed inference as one host-side scipy CSR x dense matmul
per layer (keynet/layer.py:92, keynet/sparse.py:488-492).  Since the reference
itself cannot run here (vipy/numba not installed), the baseline is an exact
reimplementation of that hot loop: the SAME keyed matrices, scipy CSR, per
layer csr.dot(x.T).T (+ relu), on this host's CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec", "vs_baseline": N}
Extra diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import keynet_tpu as keynet

    BATCH = 8192
    log("devices: %s" % jax.devices())

    try:
        net = keynet.models.LeNet_AvgPool().load_torch_state_dict(
            "/root/reference/models/mnist_lenet_avgpool.pth")
    except Exception as e:
        log("checkpoint load failed (%s); using random init" % e)
        net = keynet.models.LeNet_AvgPool(seed=1)

    t0 = time.perf_counter()
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=0)
    knet._build()
    keygen_s = time.perf_counter() - t0
    log("keygen+conversion: %.2fs, keynet nnz=%d" % (keygen_s, knet.num_parameters()))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(BATCH, 1, 28, 28)).astype(np.float32)
    xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())

    # ---------------- TPU keyed forward ------------------------------------
    xc_dev = jnp.asarray(xc)
    fwd = knet._forward
    ops = knet._ops
    y = jax.block_until_ready(fwd(ops, xc_dev))  # compile + warm
    n_iter = 20
    reps = []
    for _ in range(3):  # median-of-3: this host's wall clock varies up to 3x
        t0 = time.perf_counter()
        for _ in range(n_iter):
            y = fwd(ops, xc_dev)
        jax.block_until_ready(y)
        reps.append((time.perf_counter() - t0) / n_iter)
    tpu_s = float(np.median(reps))
    tpu_ips = BATCH / tpu_s
    log("TPU keyed forward: %.3f ms/batch(%d) = %.0f imgs/sec (median of 3: %s)"
        % (1e3 * tpu_s, BATCH, tpu_ips,
           ["%.3f" % (1e3 * r) for r in reps]))
    y_tpu_full = np.asarray(y)

    # ---------------- CPU scipy CSR baseline (reference execution model) ----
    import scipy.sparse
    layers = []
    for name, l in knet.layers().items():
        if l == "relu":
            layers.append(("relu", None))
        else:
            layers.append(("matmul_relu" if l._relu else "matmul",
                           scipy.sparse.csr_matrix(l.W)))

    def scipy_forward(xT):
        for kind, W in layers:
            if kind == "relu":
                xT = np.maximum(xT, 0)
            else:
                xT = W.dot(xT)
                if kind == "matmul_relu":
                    xT = np.maximum(xT, 0)
        return xT

    # give the baseline its BEST batch size (scipy CSR x dense degrades once
    # the dense operand falls out of cache; don't let that flatter the ratio),
    # and take the MEDIAN of 3 timed repetitions per batch size — this host's
    # wall clock varies up to 3x on identical code (vs_baseline swung
    # 45 -> 74 -> 67 across BENCH_r01-03 on a single-pass baseline)
    cpu_ips, yb = 0.0, None
    for bc in (256, 1024, BATCH):
        xT = xc[:bc].T.copy()
        scipy_forward(xT)  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = scipy_forward(xT)
            times.append(time.perf_counter() - t0)
        ips = bc / float(np.median(times))
        log("CPU scipy CSR forward: batch %d = %.0f imgs/sec (median of 3)"
            % (bc, ips))
        if ips > cpu_ips:
            cpu_ips, yb = ips, (bc, out)
    log("CPU baseline (best batch): %.0f imgs/sec" % cpu_ips)

    # sanity: same math (compare on the baseline's best batch)
    bc, out = yb
    err = np.abs(y_tpu_full[:bc] - out.T).max()
    log("TPU-vs-scipy max err: %g" % err)

    # ---------------- on-chip Pallas kernel numeric gate --------------------
    # (VERDICT round-2 #8: the kernel's only direct correctness test ran in
    # interpret mode on CPU; this asserts kernel == einsum on the real chip.)
    if jax.default_backend() == "tpu":
        import scipy.sparse as _sp
        from keynet_tpu.ops.operators import BlockSparseOp
        from keynet_tpu.ops.pallas_kernels import block_ell_matmul
        prng = np.random.default_rng(7)
        blocks = [_sp.random(128, 128, density=0.6, random_state=i,
                             data_rvs=prng.standard_normal) for i in range(12)]
        A = _sp.block_diag(blocks, format="csr") + _sp.eye(12 * 128, format="csr")
        bop = BlockSparseOp.from_scipy(A.tocsr(), tileshape=(128, 128))
        xk = jnp.asarray(prng.normal(size=(64, A.shape[1])).astype(np.float32))
        n_rb = bop.tile_ids.shape[0]
        yk = np.asarray(block_ell_matmul(xk, bop.tiles, bop.tile_ids,
                                         bop.col_blk, n_rb * 128))[:, :A.shape[0]]
        xg = xk.reshape(64, -1, 128)[:, np.asarray(bop.col_blk)]
        # HIGHEST so the reference accumulates f32 like the kernel does (the
        # default bf16 MXU passes would make the REFERENCE the noisy side)
        ye = np.asarray(jnp.einsum("brkn,rkmn->brm", xg,
                                   bop.tiles[bop.tile_ids],
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
                        .reshape(64, -1))[:, :A.shape[0]]
        kerr = float(np.abs(yk - ye).max())
        scale = float(np.abs(ye).max())
        log("Pallas kernel vs einsum on-chip: max err %g (scale %g)" % (kerr, scale))
        assert kerr <= 1e-4 * max(1.0, scale), \
            "Pallas Block-ELL kernel disagrees with einsum on-chip"

    # diagnostic: relaxed-precision mode (bf16 MXU passes, ~1e-4 fidelity)
    import keynet_tpu.globals as G
    G.GLOBAL["PRECISION"] = "default"
    knet._forward = None
    knet._build()
    fwd_fast, ops_fast = knet._forward, knet._ops
    yf = jax.block_until_ready(fwd_fast(ops_fast, xc_dev))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        yf = fwd_fast(ops_fast, xc_dev)
    jax.block_until_ready(yf)
    fast_ips = BATCH / ((time.perf_counter() - t0) / n_iter)
    log("TPU keyed forward (bf16 mode): %.0f imgs/sec (%.0fx baseline)"
        % (fast_ips, fast_ips / cpu_ips))
    G.GLOBAL["PRECISION"] = "highest"

    # ---------------- second config: AllConvNet stochastic (conversion path) --
    # captures a conversion-pipeline number in the round artifact, not just
    # LeNet serving (the reference cannot materialize this recipe as CSR at
    # all — BASELINE.md row 2; its nearest runnable execution model measured
    # 9.6 imgs/s at B=64 on this host)
    extra = None
    try:
        net_ac = keynet.models.AllConvNet(seed=1)
        t0 = time.perf_counter()
        sensor_ac, knet_ac = keynet.StochasticKeynet((3, 32, 32), net_ac,
                                                     alpha=2, blocksize=8,
                                                     seed=0)
        knet_ac._build()
        convert_s = time.perf_counter() - t0
        B_AC = 1024
        x_ac = rng.normal(size=(B_AC, 3, 32, 32)).astype(np.float32)
        xc_ac = jnp.asarray(np.asarray(
            sensor_ac.fromtensor(x_ac).encrypt().tensor()))
        fwd_ac, ops_ac = knet_ac._forward, knet_ac._ops
        ya = jax.block_until_ready(fwd_ac(ops_ac, xc_ac))
        reps_ac = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                ya = fwd_ac(ops_ac, xc_ac)
            jax.block_until_ready(ya)
            reps_ac.append((time.perf_counter() - t0) / 4)
        ac_ips = B_AC / float(np.median(reps_ac))
        log("AllConvNet stochastic: convert %.1fs, forward %.0f imgs/sec "
            "(B=%d, median of 3)" % (convert_s, ac_ips, B_AC))
        extra = {"metric": "allconv_stochastic_convert_s",
                 "value": round(convert_s, 1), "unit": "s",
                 "forward_imgs_per_sec": round(ac_ips, 1),
                 "reference": "unmaterializable as CSR (BASELINE.md row 2; "
                              "nearest runnable execution model 9.6 imgs/s)"}
    except Exception as e:
        log("AllConvNet stochastic section failed: %r" % (e,))

    out = {
        "metric": "keyed_lenet_forward_imgs_per_sec",
        "value": round(tpu_ips, 1),
        "unit": "imgs/sec",
        "vs_baseline": round(tpu_ips / cpu_ips, 2),
    }
    if extra is not None:
        out["extra"] = extra
    print(json.dumps(out))


if __name__ == "__main__":
    main()
