"""Identity-keyed VGG-16 @ 3x224x224 on the real TPU (round-3 VERDICT #2):
with identity keys every conv/pool routes to DirectConvOp (layer.py:70-119),
so Ŵ = A·W·A⁻¹ is never materialized — conversion is milliseconds of weight
re-packing and the forward is plain XLA convolutions on the MXU.  Identity
is now the FASTEST configuration, replacing the stale round-2 row
(0.56 s B=1 / 805 MB / 24 min conversion via streamed Toeplitz).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/run_vgg_identity_224.py \
          [--batches 1,8,32] [--reps 5] [--profile /tmp/vggidtrace]
"""
import argparse
import time
import numpy as np
import keynet_tpu as keynet
from keynet_tpu.globals import GLOBAL

ap = argparse.ArgumentParser()
ap.add_argument("--batches", default="1,8,32")
ap.add_argument("--reps", type=int, default=5)
ap.add_argument("--profile", default=None)
args = ap.parse_args()

GLOBAL["VERBOSE"] = True

t0 = time.time()
net = keynet.models.VGG16(seed=5)
print("[vgg224-id] model built %.1fs" % (time.time() - t0), flush=True)

t_convs = []
for rep in range(3):  # median-of-3: this host's wall clock varies up to 3x
    t0 = time.time()
    sensor, knet = keynet.IdentityKeynet((3, 224, 224), net, seed=0)
    knet._build()
    t_convs.append(time.time() - t0)
t_conv = float(np.median(t_convs))
print("[vgg224-id] CONVERTED in %.2fs (median of 3: %s)  nnz=%d  device_bytes=%d"
      % (t_conv, ["%.2f" % t for t in t_convs], knet.num_parameters(),
         knet.device_bytes()), flush=True)

x = np.random.default_rng(0).normal(size=(1, 3, 224, 224)).astype(np.float32)
y = np.asarray(net.forward(x)).flatten()
xc = sensor.fromtensor(x).encrypt().tensor()
t0 = time.time()
yk = np.asarray(knet.forward(xc)).flatten()
t_cold = time.time() - t0
err = float(np.abs(y - yk).max())
print("[vgg224-id] keyed==source max err = %.3g (scale %.3g)  cold fwd %.2fs"
      % (err, float(np.abs(y).max()), t_cold), flush=True)

import jax
for B in [int(b) for b in args.batches.split(",")]:
    xb = np.random.default_rng(1).normal(size=(B, 3, 224, 224)).astype(np.float32)
    xcb = sensor.fromtensor(xb).encrypt().tensor()
    yb = knet.forward(xcb)
    yb.block_until_ready()
    reps = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(args.reps):
            yb = knet.forward(xcb)
        yb.block_until_ready()
        reps.append((time.time() - t0) / args.reps)
    dt = float(np.median(reps))
    print("[vgg224-id] B=%d  warm %.4fs  %.1f imgs/sec  (%.2f ms/img)"
          % (B, dt, B / dt, 1e3 * dt / B), flush=True)
    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(3):
                yb = knet.forward(xcb)
            yb.block_until_ready()
        print("[vgg224-id] trace for B=%d -> %s" % (B, args.profile), flush=True)

print("[vgg224-id] RESULT %s  convert_s=%.2f nnz=%d bytes=%d err=%.3g"
      % ("PASS" if err < 1e-3 else "FAIL", t_conv, knet.num_parameters(),
         knet.device_bytes(), err), flush=True)
