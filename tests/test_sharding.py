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
