"""Serve a pre-converted orth-VGG-224 keynet from a save_keynet snapshot.

Skips the ~10-minute conversion: load the .npz (made by a prior
run/scripts/run_vgg_orth_224.py conversion + serialize.save_keynet), then
measure warm forwards at the requested batch sizes on the real TPU, with an
optional jax.profiler trace.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_vgg_orth.py \
      --snapshot /tmp/vgg_orth_r3.npz [--batches 1,8,32] [--profile DIR]
"""
import argparse
import time

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--snapshot", default="/tmp/vgg_orth_r3.npz")
ap.add_argument("--batches", default="1,8,32")
ap.add_argument("--reps", type=int, default=5)
ap.add_argument("--profile", default=None)
ap.add_argument("--check", action="store_true",
                help="also rebuild the source net and check keyed==source")
args = ap.parse_args()

import jax
import keynet_tpu as keynet
from keynet_tpu.serialize import load_keynet

t0 = time.time()
sensor, knet = load_keynet(args.snapshot)
print("[serve-vgg] loaded %s in %.1fs  device_bytes=%d"
      % (args.snapshot, time.time() - t0, knet.device_bytes()), flush=True)

rng = np.random.default_rng(0)
if args.check:
    net = keynet.models.VGG16(seed=5)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    y = np.asarray(net.forward(x)).ravel()
    xc = sensor.fromtensor(x).encrypt().tensor()
    yk = np.asarray(knet.forward(xc)).ravel()
    print("[serve-vgg] keyed==source max err %.3g (scale %.3g)"
          % (np.abs(y - yk).max(), np.abs(y).max()), flush=True)

for B in [int(b) for b in args.batches.split(",")]:
    xb = rng.normal(size=(B, 3, 224, 224)).astype(np.float32)
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
    print("[serve-vgg] B=%d  warm %.3fs  %.1f imgs/sec  (cold %.1fs)"
          % (B, dt, B / dt, cold), flush=True)
    if args.profile:
        tdir = "%s_B%d" % (args.profile, B)
        with jax.profiler.trace(tdir):
            for _ in range(3):
                yb = knet.forward(xcb)
            yb.block_until_ready()
        print("[serve-vgg] trace for B=%d -> %s" % (B, tdir), flush=True)
