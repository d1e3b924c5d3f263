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

    BATCH = 1024
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
    t0 = time.perf_counter()
    for _ in range(n_iter):
        y = fwd(ops, xc_dev)
    jax.block_until_ready(y)
    tpu_s = (time.perf_counter() - t0) / n_iter
    tpu_ips = BATCH / tpu_s
    log("TPU keyed forward: %.3f ms/batch(%d) = %.0f imgs/sec"
        % (1e3 * tpu_s, BATCH, tpu_ips))

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

    xT = xc.T.copy()
    scipy_forward(xT)  # warm
    n_iter_cpu = 3
    t0 = time.perf_counter()
    for _ in range(n_iter_cpu):
        yb = scipy_forward(xT)
    cpu_s = (time.perf_counter() - t0) / n_iter_cpu
    cpu_ips = BATCH / cpu_s
    log("CPU scipy CSR forward: %.3f ms/batch(%d) = %.0f imgs/sec"
        % (1e3 * cpu_s, BATCH, cpu_ips))

    # sanity: same math
    y_tpu = np.asarray(y)
    err = np.abs(y_tpu - yb.T).max()
    log("TPU-vs-scipy max err: %g" % err)

    print(json.dumps({
        "metric": "keyed_lenet_forward_imgs_per_sec",
        "value": round(tpu_ips, 1),
        "unit": "imgs/sec",
        "vs_baseline": round(tpu_ips / cpu_ips, 2),
    }))


if __name__ == "__main__":
    main()
