"""Inspect the published thin-factor structure of a stochastic-recipe keyed
conv (the B=1/B=32 serving bottleneck, docs/SERVING.md round 4): per-link
shapes/K, and for each EllOp the run-support statistics that decide whether
a faster structured apply exists:

  - per p-run of rows: |union of column support| (dense-run-block feasibility)
  - per 128-row block: distinct 128-col blocks (Block-ELL feasibility)

Usage: PYTHONPATH=/root/repo python scripts/inspect_stoch_factors.py [layer]
"""
import sys
import time

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

import scipy.sparse
from keynet_tpu import keys
from keynet_tpu.layer import KeyedLayer
from keynet_tpu.models import specs
from keynet_tpu.globals import GLOBAL
from keynet_tpu.ops.operators import ChainedOp, EllOp

GLOBAL["VERBOSE"] = True

LAYERS = {
    "conv1_1": ((3, 224, 224), (64, 224, 224)),
    "conv2_1": ((64, 112, 112), (128, 112, 112)),
}
name = sys.argv[1] if len(sys.argv) > 1 else "conv2_1"
inshape, outshape = LAYERS[name]

kw = dict(global_geometric="hierarchical_permutation",
          hierarchical_blockshape=(2, 2),
          hierarchical_permute_at_level=(0, 1, 2),
          local_geometric="doubly_stochastic", alpha=2.0, blocksize=14,
          local_photometric="uniform_random_affine", beta=1.0, gamma=1.0,
          memoryorder="channel")

rng = np.random.default_rng(0)
_, Ainv_in = keys.keygen(inshape, seed=1, **kw)
A_out, _ = keys.keygen(outshape, seed=2, **kw)

C1, C2 = inshape[0], outshape[0]
params = {"weight": (rng.standard_normal((C2, C1, 3, 3)) * 0.05).astype(np.float32),
          "bias": (rng.standard_normal(C2) * 0.1).astype(np.float32)}

t0 = time.time()
layer = KeyedLayer(specs.Conv2d(name, C1, C2, 3), inshape, outshape,
                   A=A_out, Ainv=Ainv_in, params=params,
                   rng=np.random.default_rng(7))
print("convert %.1fs" % (time.time() - t0), flush=True)

op = layer._op
links = op.ops if isinstance(op, ChainedOp) else [op]
print("chain of %d links:" % len(links))
for j, l in enumerate(links):
    print("  link%d %s shape=%s bytes=%.1fMB" % (
        j, type(l).__name__, l.shape, l.device_bytes() / 1e6))
    if not isinstance(l, EllOp):
        continue
    cols = np.asarray(l.cols)
    vals = np.asarray(l.vals)
    K = cols.shape[1]
    live = (vals != 0)
    kpr = live.sum(1)
    print("    EllOp K=%d  mean nnz/row=%.1f  rows=%d" %
          (K, kpr.mean(), cols.shape[0]))
    n_rows = cols.shape[0]
    for p in (196, 392, 784, 1568):
        if (n_rows - 1) % p and n_rows % p:
            continue
        nr = (n_rows // p) * p
        c = np.where(live[:nr], cols[:nr], -1).reshape(-1, p * K)
        supp = [np.unique(r[r >= 0]).size for r in c[:256]]
        print("    run p=%4d: support/run mean=%.0f max=%d (dense block = "
              "%.1f KB/run, total %.2f GB)" %
              (p, np.mean(supp), np.max(supp),
               p * np.mean(supp) * 4 / 1e3,
               (nr // p) * p * np.mean(supp) * 4 / 1e9))
    # 128-row block -> distinct 128-col blocks
    nr = (n_rows // 128) * 128
    cb = np.where(live[:nr], cols[:nr] // 128, -1).reshape(-1, 128 * K)
    nblk = [np.unique(r[r >= 0]).size for r in cb[:512]]
    print("    128-row blocks: distinct col-blocks mean=%.1f max=%d "
          "(Block-ELL = %.2f GB f32)" %
          (np.mean(nblk), np.max(nblk),
           (nr // 128) * np.mean(nblk) * 128 * 128 * 4 / 1e9))
