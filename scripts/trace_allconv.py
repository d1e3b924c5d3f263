"""Trace-attribute the AllConvNet/cifar_bn stochastic keyed forward on TPU.

VERDICT r4 #5: the mid-size nets (4,993 / 4,018 imgs/s) are the least
examined perf surface — same methodology as the VGG work: convert, warm,
capture a jax.profiler trace of a few forwards, then summarize with
scripts/trace_report.py --scopes 2.

  python scripts/trace_allconv.py [--bn] [--batch 1024] [--trace /tmp/actrace]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bn", action="store_true", help="use AllConvNet(bn=True) (cifar_bn)")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--trace", default="/tmp/actrace")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import keynet_tpu as keynet

    net = keynet.models.AllConvNet(seed=1, batchnorm=args.bn)
    t0 = time.perf_counter()
    sensor, knet = keynet.StochasticKeynet((3, 32, 32), net, alpha=2,
                                           blocksize=8, seed=0)
    knet._build()
    print("convert: %.1fs" % (time.perf_counter() - t0), flush=True)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.batch, 3, 32, 32)).astype(np.float32)
    xc = jnp.asarray(np.asarray(sensor.fromtensor(x).encrypt().tensor()))
    fwd, ops = knet._forward, knet._ops
    y = jax.block_until_ready(fwd(ops, xc))

    # layer/op inventory (types only — pulling op internals here can trigger
    # large host transfers through the tunnel)
    for name, l in knet.layers().items():
        if l == "relu":
            continue
        print("%-18s %s" % (name, type(l).__name__), flush=True)

    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = fwd(ops, xc)
        jax.block_until_ready(y)
        reps.append((time.perf_counter() - t0) / args.iters)
    ips = args.batch / float(np.median(reps))
    print("forward: %.2f ms/batch(%d) = %.0f imgs/sec (median of 3: %s)"
          % (1e3 * float(np.median(reps)), args.batch, ips,
             ["%.2f" % (1e3 * r) for r in reps]), flush=True)

    with jax.profiler.trace(args.trace):
        for _ in range(args.iters):
            y = fwd(ops, xc)
        jax.block_until_ready(y)
    print("trace written to %s (summarize: python scripts/trace_report.py %s "
          "--scopes 2 --top 30)" % (args.trace, args.trace), flush=True)


if __name__ == "__main__":
    main()
