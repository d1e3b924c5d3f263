"""Full stochastic VGG-16 @ 3x224x224 keynet on the real TPU: the reference's
test_vgg16_stochastic recipe (/root/reference/test/test_keynet.py:116-130 —
hierarchical global permutation + doubly-stochastic local + local affine,
blocksize 14, memoryorder channel), which the reference runs with 48 host
processes and which needs the masked re-keying chains + dense-inverse splits
(keynet_tpu/ops/streaming.py) to be materializable at all.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/run_vgg_stochastic_224.py
"""
import time
import numpy as np
import keynet_tpu as keynet
from keynet_tpu.globals import GLOBAL

GLOBAL["VERBOSE"] = True
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
print("[vgg224-stoch] CONVERTED in %.1fs  nnz=%d  device_bytes=%d" % (
    t_conv, knet.num_parameters(), knet.device_bytes()), flush=True)

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
print("[vgg224-stoch] keyed==source max err = %.3g (scale %.3g)  forward cold %.2fs warm %.2fs"
      % (err, float(np.abs(y).max()), t_fwd_cold, t_fwd), flush=True)
print("[vgg224-stoch] RESULT %s  convert_s=%.1f nnz=%d bytes=%d err=%.3g"
      % ("PASS" if err < 1e-3 else "FAIL", t_conv, knet.num_parameters(),
         knet.device_bytes(), err), flush=True)
