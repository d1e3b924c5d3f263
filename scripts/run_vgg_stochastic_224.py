"""Full stochastic VGG-16 @ 3x224x224 keynet on the real TPU: the reference's
test_vgg16_stochastic recipe (/root/reference/test/test_keynet.py:116-130 —
hierarchical global permutation + doubly-stochastic local + local affine,
blocksize 14, memoryorder channel), which the reference runs with 48 host
processes and which needs the masked re-keying chains + dense-inverse splits
(keynet_tpu/ops/streaming.py) to be materializable at all.

Round-3 additions mirror run_vgg_orth_224.py: bf16 tile storage
(--tile-dtype bfloat16), multi-batch serving throughput (--batches 1,8,32),
and a snapshot (--save).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/run_vgg_stochastic_224.py \
          [--tile-dtype bfloat16] [--batches 1,8,32]
"""
import argparse
import time
import numpy as np
import keynet_tpu as keynet
from keynet_tpu.globals import GLOBAL

ap = argparse.ArgumentParser()
ap.add_argument("--tile-dtype", default="float32", choices=["float32", "bfloat16"])
ap.add_argument("--batches", default="1")
ap.add_argument("--reps", type=int, default=5)
ap.add_argument("--profile", default=None)
ap.add_argument("--save", default=None,
                help="save_keynet snapshot path (serve later via serve_vgg_orth.py)")
args = ap.parse_args()

GLOBAL["VERBOSE"] = True
if args.tile_dtype != "float32":
    GLOBAL["TILE_DTYPE"] = args.tile_dtype

t0 = time.time()
net = keynet.models.VGG16(seed=5)
print("[vgg224-stoch] model built %.1fs" % (time.time() - t0), flush=True)

t0 = time.time()
sensor, knet = keynet.Keynet((3, 224, 224), net,
                             global_geometric="hierarchical_permutation",
                             hierarchical_blockshape=(2, 2),
                             hierarchical_permute_at_level=(0, 1, 2),
                             local_geometric="doubly_stochastic", alpha=2.0,
                             blocksize=14,
                             local_photometric="uniform_random_affine",
                             beta=1.0, gamma=1.0, memoryorder="channel", seed=0)
t_conv = time.time() - t0
print("[vgg224-stoch] CONVERTED in %.1fs  nnz=%d  device_bytes=%d  tile_dtype=%s" % (
    t_conv, knet.num_parameters(), knet.device_bytes(), args.tile_dtype), flush=True)

x = np.random.default_rng(0).normal(size=(1, 3, 224, 224)).astype(np.float32)
y = np.asarray(net.forward(x)).flatten()
xc = sensor.fromtensor(x).encrypt().tensor()
t0 = time.time()
yk = np.asarray(knet.forward(xc)).flatten()
t_fwd_cold = time.time() - t0
t0 = time.time()
yk = np.asarray(knet.forward(xc)).flatten()
t_fwd = time.time() - t0
err = float(np.abs(y - yk).max())
tol = 1e-3 if args.tile_dtype == "float32" else 3e-2  # bf16 tiles: ~2.5e-3 rel
print("[vgg224-stoch] keyed==source max err = %.3g (scale %.3g)  forward cold %.2fs warm %.2fs"
      % (err, float(np.abs(y).max()), t_fwd_cold, t_fwd), flush=True)

# --- serving throughput at batch ---------------------------------------------
for B in [int(b) for b in args.batches.split(",")]:
    xb = np.random.default_rng(1).normal(size=(B, 3, 224, 224)).astype(np.float32)
    xcb = sensor.fromtensor(xb).encrypt().tensor()
    t0 = time.time()
    yb = knet.forward(xcb)
    yb.block_until_ready()
    cold = time.time() - t0
    t0 = time.time()
    for _ in range(args.reps):
        yb = knet.forward(xcb)
    yb.block_until_ready()
    dt = (time.time() - t0) / args.reps
    print("[vgg224-stoch] B=%d  warm %.3fs  %.1f imgs/sec  (cold %.1fs)"
          % (B, dt, B / dt, cold), flush=True)
    if args.profile:
        import jax
        tdir = "%s/B%d" % (args.profile, B)  # per-batch dirs: trace_report
        with jax.profiler.trace(tdir):       # on a specific B, not just the
            for _ in range(3):               # most recent dump
                yb = knet.forward(xcb)
            yb.block_until_ready()
        print("[vgg224-stoch] trace for B=%d -> %s" % (B, tdir), flush=True)

if args.save:
    from keynet_tpu.serialize import save_keynet
    t0 = time.time()
    save_keynet(args.save, knet, sensor=sensor, include_keys=True)
    print("[vgg224-stoch] snapshot -> %s (%.1fs)" % (args.save, time.time() - t0),
          flush=True)

print("[vgg224-stoch] RESULT %s  convert_s=%.1f nnz=%d bytes=%d err=%.3g"
      % ("PASS" if err < tol else "FAIL", t_conv, knet.num_parameters(),
         knet.device_bytes(), err), flush=True)
