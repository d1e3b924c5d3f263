"""Profile stochastic-recipe keygen for one VGG-224 window on the host CPU.

The upfront keypair generation is ~8 min of the 17.5-min stochastic VGG-224
conversion (after the fused inverse-key emission); this isolates one window
with cProfile to show where the remaining time goes.

Usage: PYTHONPATH=/root/repo python scripts/profile_stoch_keygen.py [C H W]
"""
import sys, time, cProfile, pstats, io
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from keynet_tpu import keys

shape = tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (64, 224, 224)
kw = dict(global_geometric="hierarchical_permutation",
          hierarchical_blockshape=(2, 2),
          hierarchical_permute_at_level=(0, 1, 2),
          local_geometric="doubly_stochastic", alpha=2.0, blocksize=14,
          local_photometric="uniform_random_affine", beta=1.0, gamma=1.0,
          memoryorder="channel")

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
A, Ainv = keys.keygen(shape, seed=3, **kw)
pr.disable()
print("keygen %s: %.1fs  nnzA=%d  nnzAinv=%d"
      % (shape, time.time() - t0, A.nnz, Ainv.nnz), flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
print(s.getvalue())
