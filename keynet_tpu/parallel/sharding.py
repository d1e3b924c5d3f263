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


def shard_keynet_ops(knet, mesh, tp_axis="tp", min_tp_bytes=32 * 1024 * 1024):
    """Place keyed matrices on the mesh with large dense layers sharded over
    ``tp_axis`` along their contraction (n_in) dimension — e.g. keyed VGG-16
    fc6 (4097 x 25089, 411 MB) splits column-wise; XLA inserts the psum of the
    tp-partial products.  Everything else (tiles, index arrays, small denses)
    replicates.  Returns the sharded ops tuple for knet._forward."""
    from ..ops.operators import DenseOp

    knet._build()
    repl = NamedSharding(mesh, P())
    tp = mesh.shape[tp_axis] if tp_axis in mesh.axis_names else 1
    out = []
    for op in knet._ops:
        if (isinstance(op, DenseOp) and tp > 1
                and op.W.size * 4 >= min_tp_bytes and op.W.shape[1] % tp == 0):
            W = jax.device_put(op.W, NamedSharding(mesh, P(None, tp_axis)))
            out.append(DenseOp(W, nnz=op.nnz()))
        else:
            out.append(jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), op))
    return tuple(out)


def keyed_forward_dp_tp(knet, mesh, dp_axis="dp", tp_axis="tp", **kwargs):
    """Batch-parallel + tensor-parallel keyed inference over a (dp, tp) mesh."""
    ops = shard_keynet_ops(knet, mesh, tp_axis, **kwargs)
    fwd = knet._forward

    def f(x):
        xs = jax.device_put(jnp.asarray(x, dtype=jnp.float32),
                            NamedSharding(mesh, P(dp_axis, None)))
        return fwd(ops, xs)

    return f
