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
    from ..ops.operators import DenseOp, BlockSparseOp, PermutedBlockSparseOp

    knet._build()
    repl = NamedSharding(mesh, P())
    tp = mesh.shape[tp_axis] if tp_axis in mesh.axis_names else 1
    out = []
    for op in knet._ops:
        if (isinstance(op, DenseOp) and tp > 1
                and op.W.size * 4 >= min_tp_bytes and op.W.shape[1] % tp == 0):
            W = jax.device_put(op.W, NamedSharding(mesh, P(None, tp_axis)))
            out.append(DenseOp(W, nnz=op.nnz()))
            continue
        if (isinstance(op, (BlockSparseOp, PermutedBlockSparseOp)) and tp > 1
                and op.device_bytes() >= min_tp_bytes):
            tpop = tp_shard_block_op(op, mesh, tp_axis)
            if tpop is not None:
                out.append(tpop)
                continue
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


@jax.tree_util.register_pytree_node_class
class TpShardedBlockEllOp:
    """Tensor-parallel Block-ELL apply: tile-row partition over a 'tp' mesh
    axis (VERDICT round-2 #9 / SURVEY §2.5 TP row).

    Each device holds a COMPACTED tile store for its contiguous row-block
    range (BlockSparseOp.row_shard_plan) plus local index arrays; x is
    replicated and each shard produces its own output rows, concatenated
    along the feature dim by shard_map's output spec — no collectives beyond
    x's replication.  Per-chip tile HBM drops toward unique/tp for
    row-local tile reuse (the scattered-key case that replicated in round 2).
    """

    def __init__(self, tiles, tile_ids, col_blk, shape, tileshape, nnz,
                 mesh, tp_axis="tp"):
        self.tiles = tiles        # (tp, u_max, TM, TN)
        self.tile_ids = tile_ids  # (tp, rb_per, KB) local ids
        self.col_blk = col_blk    # (tp, rb_per, KB)
        self.shape = tuple(shape)
        self.tileshape = tuple(tileshape)
        self._nnz = int(nnz)
        self.mesh = mesh
        self.tp_axis = tp_axis

    @staticmethod
    def from_block_op(op, mesh, tp_axis="tp"):
        """Build from a BlockSparseOp, placing per-shard arrays on the mesh."""
        tp = mesh.shape[tp_axis]
        plan = op.row_shard_plan(tp)
        sh = NamedSharding(mesh, P(tp_axis))
        return TpShardedBlockEllOp(
            jax.device_put(jnp.asarray(plan["tiles"]), sh),
            jax.device_put(jnp.asarray(plan["tile_ids"]), sh),
            jax.device_put(jnp.asarray(plan["col_blk"]), sh),
            op.shape, op.tileshape, op.nnz(), mesh, tp_axis)

    def apply(self, x):
        from jax.experimental.shard_map import shard_map
        from ..globals import precision
        B = x.shape[0]
        TM, TN = self.tileshape
        n_out, n_in = self.shape
        n_cb = -(-n_in // TN)
        pad_in = n_cb * TN - n_in
        if pad_in:
            x = jnp.pad(x, ((0, 0), (0, pad_in)))
        if self.tiles.dtype != jnp.float32:
            x = x.astype(self.tiles.dtype)
        prec = precision() if self.tiles.dtype == jnp.float32 else None

        def shard_fn(tiles, ids, cols, xs):
            tiles, ids, cols = tiles[0], ids[0], cols[0]  # drop sharded lead dim
            xb = xs.reshape(xs.shape[0], n_cb, TN)
            xg = xb[:, cols]                    # (B, rb_per, KB, TN)
            Tg = tiles[ids]                     # (rb_per, KB, TM, TN)
            y = jnp.einsum("brkn,rkmn->brm", xg, Tg,
                           preferred_element_type=jnp.float32, precision=prec)
            return y.reshape(xs.shape[0], -1)

        ax = self.tp_axis
        y = shard_map(shard_fn, mesh=self.mesh,
                      in_specs=(P(ax), P(ax), P(ax), P()),
                      out_specs=P(None, ax))(
            self.tiles, self.tile_ids, self.col_blk, x)
        return y[:, :n_out]

    def nnz(self):
        return self._nnz

    def device_bytes(self):
        """Total bytes across shards; per-chip is 1/tp of the tile term."""
        return int(self.tiles.size) * self.tiles.dtype.itemsize \
            + int(self.tile_ids.size) * 8

    def per_chip_tile_bytes(self):
        return int(self.tiles[0].size) * self.tiles.dtype.itemsize

    def arrays(self):
        return {"tiles": self.tiles, "tile_ids": self.tile_ids,
                "col_blk": self.col_blk}

    def tree_flatten(self):
        return (self.tiles, self.tile_ids, self.col_blk), \
            (self.shape, self.tileshape, self._nnz, self.mesh, self.tp_axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        op = cls.__new__(cls)
        op.tiles, op.tile_ids, op.col_blk = children
        op.shape, op.tileshape, op._nnz, op.mesh, op.tp_axis = aux
        return op


def tp_shard_block_op(op, mesh, tp_axis="tp", max_replication=0.75):
    """Convert a (Permuted)BlockSparseOp to tile-row tp sharding when the
    per-shard compacted stores actually reduce per-chip memory (periodic
    matrices share tiles across shards and gain nothing — keep those
    replicated and batch-parallel).  Returns the converted op or None."""
    from ..ops.operators import BlockSparseOp, PermutedBlockSparseOp
    inner = op.inner if isinstance(op, PermutedBlockSparseOp) else op
    if not isinstance(inner, BlockSparseOp):
        return None
    tp = mesh.shape[tp_axis] if tp_axis in mesh.axis_names else 1
    if tp <= 1:
        return None
    # worthwhile only when no shard needs more than max_replication of the
    # full UNIQUE nonzero tile set (the zero tile is bookkeeping, not memory
    # that replication would have cost)
    ids = np.asarray(inner.tile_ids)
    n_rb = ids.shape[0]
    rb_per = -(-n_rb // tp)
    full_u = max(1, len(np.setdiff1d(np.unique(ids), [0])))
    per_u = max(len(np.setdiff1d(np.unique(ids[j * rb_per:(j + 1) * rb_per]),
                                 [0])) for j in range(tp))
    if per_u > max_replication * full_u:
        return None
    plan = inner.row_shard_plan(tp)
    sh = NamedSharding(mesh, P(tp_axis))
    tp_inner = TpShardedBlockEllOp(
        jax.device_put(jnp.asarray(plan["tiles"]), sh),
        jax.device_put(jnp.asarray(plan["tile_ids"]), sh),
        jax.device_put(jnp.asarray(plan["col_blk"]), sh),
        inner.shape, inner.tileshape, inner.nnz(), mesh, tp_axis)
    if isinstance(op, PermutedBlockSparseOp):
        repl = NamedSharding(mesh, P())
        return PermutedBlockSparseOp(
            tp_inner, jax.device_put(op.perm_in, repl),
            jax.device_put(op.perm_out_pos, repl), op.shape,
            layout_in=op.layout_in, layout_out=op.layout_out)
    return tp_inner
