"""Multi-chip scaling for keyed inference and source-model training.

The reference has no distributed runtime (single-host scipy; nn.DataParallel
only for CIFAR training, keynet/cifar10.py:113).  On TPU the natural scaling
axes are:

  * dp — the cipher batch: keyed inference is row-parallel over the
    N x (D+1) homogeneous batch (reference keynet/layer.py:92), so batches
    shard cleanly over a 'dp' mesh axis with replicated keys;
  * tp — large keyed matrices (e.g. keyed VGG-16 fc6, ~25089 x 4097 both-side
    dense) shard column-wise over a 'tp' axis; each shard multiplies its
    column slice of Ŵᵀ and results concatenate without collectives, while
    input activations are all-gathered along tp.

Shardings are expressed with jax.sharding.NamedSharding + jit so XLA inserts
the ICI collectives.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_mesh(n_devices=None, axis="dp", devices=None):
    """1-D mesh over available devices for batch-parallel keyed inference."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(x, mesh, axis="dp"):
    """Place a (N, D) batch with rows sharded across the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis, None)))


def replicate_ops(ops, mesh):
    """Replicate every keyed-matrix array across the mesh (keys are small
    relative to HBM; tp sharding of large layers is applied separately)."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), ops)


def keyed_forward_sharded(knet, mesh, axis="dp"):
    """Return f(x) running knet's jitted forward with the batch sharded over
    ``axis`` and keys replicated; XLA handles the rest."""
    knet._build()
    ops = replicate_ops(knet._ops, mesh)
    fwd = knet._forward

    def f(x):
        xs = shard_batch(jnp.asarray(x, dtype=jnp.float32), mesh, axis)
        return fwd(ops, xs)

    return f
