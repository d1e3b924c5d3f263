"""Profile a conv5-scale non-identity keyed conv conversion (STATUS gap #1).

512ch 14x14, k=3 s=1, local givens alpha=14 blocksize=14 (whole-image block,
matching the vgg16 demo config at conv5 scale).  Host-side work, runs on CPU.
"""
import time, cProfile, pstats, sys, io
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from keynet_tpu import keys
from keynet_tpu.ops.streaming import keyed_conv_streaming
from keynet_tpu.globals import GLOBAL
GLOBAL["VERBOSE"] = True

C = int(sys.argv[1]) if len(sys.argv) > 1 else 256
HW = 14
shape = (C, HW, HW)
rng = np.random.default_rng(0)
t0 = time.time()
A, Ainv = keys.keygen(shape, local_geometric="givens_orthogonal", alpha=14,
                      blocksize=14, seed=0)
print("keygen %.1fs nnzA=%d nnz/row=%.1f" % (time.time() - t0, A.nnz, A.nnz / A.shape[0]))

w = rng.standard_normal((C, C, 3, 3)).astype(np.float32) * 0.05
b = rng.standard_normal(C).astype(np.float32) * 0.1

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
op = keyed_conv_streaming(shape, shape, w, b, 1, A, Ainv)
pr.disable()
print("convert %.1fs nnz=%d bytes=%d" % (time.time() - t0, op.nnz(), op.device_bytes()))
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
print(s.getvalue())
