"""Multi-device batch sharding of keyed inference over a virtual 8-CPU mesh:
sharded forward must equal single-device forward exactly."""

import numpy as np
import jax
import pytest

import keynet_tpu as keynet
from keynet_tpu.parallel import batch_mesh, keyed_forward_sharded, shard_batch


@pytest.fixture(scope="module")
def keyed_lenet():
    net = keynet.models.LeNet_AvgPool(seed=1)
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=0)
    return net, sensor, knet


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_forward_matches(keyed_lenet):
    net, sensor, knet = keyed_lenet
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 1, 28, 28)).astype(np.float32)
    xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())

    knet._build()
    y_single = np.asarray(knet._forward(knet._ops, xc))

    mesh = batch_mesh()
    f = keyed_forward_sharded(knet, mesh)
    y_sharded = np.asarray(f(xc))
    assert np.allclose(y_single, y_sharded, atol=1e-5)


def test_shard_batch_placement(keyed_lenet):
    mesh = batch_mesh()
    x = np.ones((16, 785), dtype=np.float32)
    xs = shard_batch(x, mesh)
    assert xs.sharding.num_devices == 8


def test_dp_tp_keyed_forward(keyed_lenet):
    """dp×tp mesh: batch rows shard over dp, large dense keyed matrices shard
    column-wise over tp; result equals single-device forward."""
    from jax.sharding import Mesh
    from keynet_tpu.parallel import keyed_forward_dp_tp, shard_keynet_ops
    net, sensor, knet = keyed_lenet
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 1, 28, 28)).astype(np.float32)
    xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
    knet._build()
    y_single = np.asarray(knet._forward(knet._ops, xc))
    # force fc-scale shard threshold low enough that conv1 (14.8MB) tp-shards
    ops = shard_keynet_ops(knet, mesh, min_tp_bytes=1 << 20)
    from keynet_tpu.ops.operators import DenseOp
    assert any(isinstance(o, DenseOp) and o.W.sharding.num_devices >= 2 for o in ops)
    f = keyed_forward_dp_tp(knet, mesh, min_tp_bytes=1 << 20)
    y = np.asarray(f(xc))
    assert np.allclose(y_single, y, atol=1e-5)


def test_tp_sharded_block_ell():
    """Tile-row tp sharding of a Block-ELL op (VERDICT round-2 #9): the
    sharded apply must equal the single-device apply, and per-chip tile
    memory must drop when tile reuse is row-local."""
    import scipy.sparse
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from keynet_tpu.ops.operators import BlockSparseOp
    from keynet_tpu.parallel.sharding import tp_shard_block_op

    rng = np.random.default_rng(0)
    # row-local tiles: block-diagonal-ish random matrix, no cross-row reuse
    n = 1024
    blocks = [rng.standard_normal((128, 128)).astype(np.float32)
              for _ in range(n // 128)]
    A = scipy.sparse.block_diag(blocks, format="csr")
    op = BlockSparseOp.from_scipy(A, tileshape=(128, 128))

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "tp"))
    tpop = tp_shard_block_op(op, mesh, "tp")
    assert tpop is not None
    # per-chip tiles ~ unique/4 (+1 zero tile slack)
    full = int(np.asarray(op.tiles).size) * 4
    assert tpop.per_chip_tile_bytes() <= full // 3

    x = rng.standard_normal((4, n)).astype(np.float32)
    y0 = np.asarray(op.apply(jnp.asarray(x)))
    y1 = np.asarray(tpop.apply(jnp.asarray(x)))
    assert np.allclose(y0, y1, atol=1e-5)


def test_tp_shard_declines_globally_periodic():
    """A matrix whose tiles repeat across all row-blocks gains nothing from
    tile-row sharding: the planner must decline (keep replicated)."""
    import scipy.sparse
    from jax.sharding import Mesh
    from keynet_tpu.ops.operators import BlockSparseOp
    from keynet_tpu.parallel.sharding import tp_shard_block_op
    rng = np.random.default_rng(1)
    b1 = rng.standard_normal((128, 128)).astype(np.float32)
    b2 = rng.standard_normal((128, 128)).astype(np.float32)
    A = scipy.sparse.block_diag([b1, b2] * 4, format="csr")  # 2 unique tiles,
    # both referenced by every shard
    op = BlockSparseOp.from_scipy(A, tileshape=(128, 128))
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "tp"))
    assert tp_shard_block_op(op, mesh, "tp") is None


def test_shard_keynet_ops_uses_tp_block(keyed_lenet):
    """shard_keynet_ops routes big row-local Block-ELL layers to tile-row tp
    sharding and the dp x tp forward still matches single-device."""
    import scipy.sparse
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from collections import OrderedDict
    from keynet_tpu.ops.operators import BlockSparseOp
    from keynet_tpu.layer import KeyedLayer
    from keynet_tpu.system import KeyedModel
    from keynet_tpu.parallel import keyed_forward_dp_tp
    from keynet_tpu.parallel.sharding import TpShardedBlockEllOp

    rng = np.random.default_rng(2)
    n = 1024
    blocks = [rng.standard_normal((128, 128)).astype(np.float32) * 0.1
              for _ in range(n // 128)]
    A = scipy.sparse.block_diag(blocks, format="csr")
    kl = KeyedLayer(W=A, format="block")
    knet = KeyedModel.from_layers(OrderedDict([("m", kl)]), (n, 1, 1))
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "tp"))
    knet._build()
    x = rng.standard_normal((8, n)).astype(np.float32)
    y0 = np.asarray(knet._forward(knet._ops, jnp.asarray(x)))
    from keynet_tpu.parallel.sharding import shard_keynet_ops
    ops = shard_keynet_ops(knet, mesh, min_tp_bytes=1 << 16)
    assert any(isinstance(getattr(o, "inner", o), TpShardedBlockEllOp)
               or isinstance(o, TpShardedBlockEllOp) for o in ops)
    y1 = np.asarray(knet._forward(ops, jnp.asarray(x)))
    assert np.allclose(y0, y1, atol=1e-5)


def test_tp_sharded_kron_chain():
    """Kronecker/TapSum chain links tp-shard (taps + psum for the tap-sum,
    channel rows for the Kronecker factors) and the dp×tp forward matches
    single-device exactly (SURVEY §2.5 TP extended to the round-3 format)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.models.specs import Model, Conv2d, ReLU, Linear
    from keynet_tpu.ops.operators import ChainedOp
    from keynet_tpu.parallel.sharding import (
        shard_keynet_ops, tp_shard_chain_op, TpShardedTapSumOp,
        TpShardedKroneckerOp)
    old = GLOBAL["STREAM_NNZ"]
    GLOBAL["STREAM_NNZ"] = 10_000
    try:
        net = Model([Conv2d("conv1", 4, 4, 3), ReLU("relu1"),
                     Linear("fc1", 4 * 16 * 16, 10)], inshape=(4, 16, 16),
                    seed=2)
        sensor, knet = keynet.Keynet((4, 16, 16), net,
                                     local_geometric="givens_orthogonal",
                                     alpha=8, blocksize=16,
                                     local_photometric="uniform_random_affine",
                                     beta=1.0, gamma=1.0, seed=3)
        knet._build()
        chain = next(l.op() for l in knet.layers().values()
                     if l != "relu" and isinstance(l.op(), ChainedOp))
        mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))

        # direct conversion: sharded chain apply == replicated chain apply
        tpchain = tp_shard_chain_op(chain, mesh, "tp")
        assert tpchain is not None
        kinds = {type(o).__name__ for o in tpchain.ops}
        assert "TpShardedTapSumOp" in kinds and "TpShardedKroneckerOp" in kinds
        rng = np.random.default_rng(4)
        xh = rng.normal(size=(8, chain.shape[1])).astype(np.float32)
        xh[:, -1] = 1.0
        y0 = np.asarray(chain.apply(jnp.asarray(xh)))
        y1 = np.asarray(tpchain.apply(jnp.asarray(xh)))
        assert np.allclose(y0, y1, atol=1e-5)

        # end to end through shard_keynet_ops routing
        x = rng.normal(size=(8, 4, 16, 16)).astype(np.float32)
        xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
        yf0 = np.asarray(knet._forward(knet._ops, jnp.asarray(xc)))
        ops = shard_keynet_ops(knet, mesh, min_tp_bytes=1 << 10)
        assert any(isinstance(o, ChainedOp)
                   and any(isinstance(l, (TpShardedTapSumOp,
                                          TpShardedKroneckerOp)) for l in o.ops)
                   for o in ops)
        yf1 = np.asarray(knet._forward(ops, jnp.asarray(xc)))
        assert np.allclose(yf0, yf1, atol=1e-5)
    finally:
        GLOBAL["STREAM_NNZ"] = old


def test_dp_sharded_kron_chain_forward():
    """Kronecker/tap-sum chains replicate cleanly and serve a dp-sharded
    cipher batch identically to single-device."""
    import jax.numpy as jnp
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.models.specs import Model, Conv2d, ReLU, Linear
    from keynet_tpu.parallel import batch_mesh, keyed_forward_sharded
    old = GLOBAL["STREAM_NNZ"]
    GLOBAL["STREAM_NNZ"] = 10_000
    try:
        net = Model([Conv2d("conv1", 4, 4, 3), ReLU("relu1"),
                     Linear("fc1", 4 * 16 * 16, 10)], inshape=(4, 16, 16),
                    seed=2)
        sensor, knet = keynet.Keynet((4, 16, 16), net,
                                     local_geometric="givens_orthogonal",
                                     alpha=8, blocksize=16,
                                     local_photometric="uniform_random_affine",
                                     beta=1.0, gamma=1.0, seed=3)
        from keynet_tpu.ops.operators import ChainedOp
        assert any(isinstance(l.op(), ChainedOp)
                   for l in knet.layers().values() if l != "relu")
        x = np.random.default_rng(0).normal(size=(16, 4, 16, 16)).astype(np.float32)
        xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
        knet._build()
        y0 = np.asarray(knet._forward(knet._ops, jnp.asarray(xc)))
        f = keyed_forward_sharded(knet, batch_mesh())
        y1 = np.asarray(f(xc))
        assert np.allclose(y0, y1, atol=1e-5)
    finally:
        GLOBAL["STREAM_NNZ"] = old


def test_tp_sharded_ell_and_repblockdiag():
    """Row-sharded EllOp and block-sharded RepeatedBlockDiagOp (round-4
    VERDICT #4): sharded apply == single-device apply across the EllOp batch
    regimes, per-chip bytes drop 1/tp, and non-divisible block counts
    decline cleanly."""
    import scipy.sparse
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from keynet_tpu.ops.operators import EllOp, RepeatedBlockDiagOp
    from keynet_tpu.parallel.sharding import (TpShardedEllOp,
                                              TpShardedRepeatedBlockDiagOp)
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    rng = np.random.default_rng(0)
    A = scipy.sparse.random(333, 200, density=0.05, random_state=3,
                            dtype=np.float32, format="csr")
    eop = EllOp.from_scipy(A)
    tpe = TpShardedEllOp.from_ell_op(eop, mesh, "tp")
    assert tpe is not None
    assert tpe.per_chip_bytes() * 2 == tpe.device_bytes()
    for B in (1, 4, 16):
        x = rng.normal(size=(B, 200)).astype(np.float32)
        y0 = np.asarray(eop.apply(jnp.asarray(x)))
        y1 = np.asarray(jax.jit(tpe.apply)(jnp.asarray(x)))
        assert np.allclose(y0, y1, atol=1e-4), B
    F = rng.normal(size=(5, 5)).astype(np.float32)
    bias = rng.normal(size=40).astype(np.float32)
    rop = RepeatedBlockDiagOp(jnp.asarray(F), jnp.asarray(bias), 40)
    tpr = TpShardedRepeatedBlockDiagOp.from_op(rop, mesh, "tp")
    assert tpr is not None
    x = rng.normal(size=(3, 41)).astype(np.float32)
    assert np.allclose(np.asarray(rop.apply(jnp.asarray(x))),
                       np.asarray(jax.jit(tpr.apply)(jnp.asarray(x))), atol=1e-4)
    # 3 blocks over tp=2: not divisible -> decline (replicate upstream)
    rop3 = RepeatedBlockDiagOp(jnp.asarray(F), jnp.asarray(bias[:15]), 15)
    assert TpShardedRepeatedBlockDiagOp.from_op(rop3, mesh, "tp") is None


def test_replication_report_flags_unjustified():
    """The audit lists big replicated links; justified ones carry a reason,
    an unsharded big EllOp carries None (the dryrun asserts none remain)."""
    import scipy.sparse
    from keynet_tpu.ops.operators import EllOp, DirectConvOp
    from keynet_tpu.parallel.sharding import replication_report
    import jax.numpy as jnp
    A = scipy.sparse.random(4000, 500, density=0.2, random_state=0,
                            dtype=np.float32, format="csr")
    eop = EllOp.from_scipy(A)                  # ~big index arrays, unsharded
    rows = replication_report([eop], min_bytes=1 << 10)
    assert rows and rows[0][3] is None
    dc = DirectConvOp(jnp.zeros((4, 4, 3, 3)), None, (4, 8, 8), (4, 8, 8), 1)
    rows = replication_report([dc], min_bytes=1)
    assert rows and rows[0][3] is not None
