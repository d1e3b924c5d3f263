"""Training recipes: loss decreases on synthetic data; keyed validation path;
dp/tp-sharded training step runs on the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import keynet_tpu as keynet
from keynet_tpu import train as ktrain
from keynet_tpu import datasets


def test_train_reduces_loss():
    net = keynet.models.LeNet_AvgPool(seed=0)
    x, y = datasets.load_mnist(root=None, synthetic_n=512)
    it = datasets.batches(x, y, batch_size=32)
    tx = ktrain.make_optimizer(lr=0.05, momentum=0.9)
    params = ktrain._params_pytree(net)
    opt_state = tx.init(params)
    step = ktrain.make_train_step(net, tx)
    losses = []
    for e in range(8):
        tot, nb = 0.0, 0
        for xb, yb in it(e):
            params, opt_state, l = step(params, opt_state, jnp.asarray(xb), jnp.asarray(yb))
            tot += float(l)
            nb += 1
        losses.append(tot / nb)
    assert losses[-1] < losses[0] * 0.8, losses


def test_validate_keyed_matches_plain():
    """validate() through an encrypted sensor+keynet equals plain validation
    (the reference's `validate(..., secretkey)` path, keynet/mnist.py:92-108)."""
    net = keynet.models.LeNet_AvgPool(seed=0)
    x, y = datasets.load_mnist(root=None, synthetic_n=96)
    it = list(datasets.batches(x, y, batch_size=32, shuffle=False)(0))
    acc_plain = ktrain.validate(net, it, verbose=False)
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=0)
    acc_keyed = ktrain.validate(net, it, secret_sensor=sensor, secret_knet=knet,
                                verbose=False)
    assert acc_plain == acc_keyed


def test_sharded_train_step():
    from jax.sharding import Mesh
    devices = np.asarray(jax.devices()).reshape(4, 2)
    mesh = Mesh(devices, ("dp", "tp"))
    net = keynet.models.LeNet_AvgPool(seed=0)
    tx = ktrain.make_optimizer(lr=0.01)
    step, p_shard, batch_shard, label_shard = ktrain.make_sharded_train_step(net, tx, mesh)
    params = jax.device_put(jax.tree_util.tree_map(jnp.asarray,
                                                   ktrain._params_pytree(net)), p_shard)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(rng.normal(size=(8, 1, 28, 28)), dtype=jnp.float32),
                            batch_shard)
    labels = jax.device_put(jnp.asarray(rng.integers(0, 10, 8)), label_shard)
    params2, _, loss = step(params, opt_state, images, labels)
    assert np.isfinite(float(loss))
    # fc1 weight is actually tp-sharded
    assert params2["fc1"]["weight"].sharding.num_devices >= 2


def test_dataset_loaders_shapes():
    x, y = datasets.load_mnist(root="/nonexistent", synthetic_n=64)
    assert x.shape == (64, 1, 28, 28) and y.shape == (64,)
    x, y = datasets.load_cifar10(root=None, synthetic_n=32)
    assert x.shape == (32, 3, 32, 32)


def test_multistep_lr_decays_at_epoch_boundary():
    """MultiStepLR milestones are EPOCHS (reference keynet/cifar10.py:118);
    the optax schedule counts steps, so decay must land at
    milestone*steps_per_epoch, not at step `milestone`."""
    import optax
    tx = ktrain.make_optimizer(lr=1.0, momentum=0.0, milestones=[2],
                               gamma=0.1, steps_per_epoch=10)
    params = {"w": jnp.zeros(())}
    grads = {"w": jnp.ones(())}
    state = tx.init(params)
    lrs = []
    for _ in range(25):
        updates, state = tx.update(grads, state, params)
        lrs.append(-float(updates["w"]))
    assert lrs[5] == pytest.approx(1.0)     # epoch 0 (steps 0-9): base lr
    assert lrs[19] == pytest.approx(1.0)    # epoch 1 end: still base lr
    assert lrs[20] == pytest.approx(0.1)    # epoch 2 start: decayed
    with pytest.raises(ValueError):
        ktrain.train(None, None, milestones=[2])
