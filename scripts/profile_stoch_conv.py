"""Profile one stochastic-recipe keyed conv conversion on the host CPU.

Reproduces a single layer of the VGG-224 stochastic run (hierarchical global
permutation + doubly-stochastic alpha=2 blocksize=14 + local affine, channel
memoryorder — /root/reference/test/test_keynet.py:116-130) through the full
KeyedLayer path (dense-inverse split -> masked/kron/streaming routing), with
cProfile over the conversion.  Defaults to the conv2_1 shape, the largest
single cost in the end-to-end conversion (350 s measured round 3).

Usage: PYTHONPATH=/root/repo python scripts/profile_stoch_conv.py [layer]
       layer in {conv1_1, conv2_1, conv3_1}
"""
import time, cProfile, pstats, io, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from keynet_tpu import keys
from keynet_tpu.layer import KeyedLayer
from keynet_tpu.models import specs
from keynet_tpu.globals import GLOBAL

GLOBAL["VERBOSE"] = True

LAYERS = {
    "conv1_1": ((3, 224, 224), (64, 224, 224)),
    "conv2_1": ((64, 112, 112), (128, 112, 112)),
    "conv3_1": ((128, 56, 56), (256, 56, 56)),
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
t0 = time.time()
_, Ainv_in = keys.keygen(inshape, seed=1, **kw)
A_out, _ = keys.keygen(outshape, seed=2, **kw)
print("keygen %.1fs  nnz/row in=%.1f out=%.1f"
      % (time.time() - t0, Ainv_in.nnz / Ainv_in.shape[0],
         A_out.nnz / A_out.shape[0]), flush=True)

C1, C2 = inshape[0], outshape[0]
params = {"weight": (rng.standard_normal((C2, C1, 3, 3)) * 0.05).astype(np.float32),
          "bias": (rng.standard_normal(C2) * 0.1).astype(np.float32)}

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
layer = KeyedLayer(specs.Conv2d(name, C1, C2, 3), inshape, outshape,
                   A=A_out, Ainv=Ainv_in, params=params,
                   rng=np.random.default_rng(7))
pr.disable()
print("convert %.1fs  %r  bytes=%d" % (time.time() - t0, layer,
                                       layer.device_bytes()), flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
print(s.getvalue())
