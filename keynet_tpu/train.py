"""Source-model training (JAX/optax), replicating the reference recipes.

Reference: keynet/mnist.py:66-89 (SGD lr .003 momentum .9, NLL loss, 20
epochs, batch 64) and keynet/cifar10.py:104-140 (SGD lr .01 momentum .9,
weight decay 1e-3, MultiStepLR [200,250,300] gamma .1, 350 epochs,
DataParallel).  Data parallelism here is a jax.sharding Mesh ('dp') instead of
nn.DataParallel; large linear layers can additionally shard over 'tp'.

The environment has no torchvision/dataset downloads (zero egress), so the
loops take any (images, labels) numpy iterator; keynet_tpu.datasets provides
loaders for locally available data.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .models.specs import Linear


def log_softmax_nll(logits, labels):
    """F.nll_loss(F.log_softmax(x)) of the reference training loops."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def accuracy(logits, labels):
    return jnp.mean(jnp.argmax(logits, axis=-1) == labels)


def _params_pytree(model):
    return {k: {kk: jnp.asarray(vv) for kk, vv in d.items()}
            for k, d in model.params.items()}


def make_optimizer(lr=0.003, momentum=0.9, weight_decay=0.0, milestones=None,
                   gamma=0.1, steps_per_epoch=1):
    """SGD+momentum with optional weight decay and MultiStepLR schedule.

    `milestones` are EPOCH numbers (the reference's MultiStepLR semantics,
    keynet/cifar10.py:118); optax schedules count optimizer STEPS, so they are
    converted with `steps_per_epoch` (batches per epoch)."""
    if milestones:
        schedule = optax.piecewise_constant_schedule(
            lr, {int(m) * int(steps_per_epoch): gamma for m in milestones})
    else:
        schedule = lr
    tx = optax.sgd(schedule, momentum=momentum)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def make_train_step(model, tx, loss_fn=log_softmax_nll):
    """Jitted (params, opt_state, images, labels) -> (params, opt_state, loss)."""

    def step(params, opt_state, images, labels):
        def loss(p):
            logits = model.forward(images, params=p)
            return loss_fn(logits, labels)
        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    return jax.jit(step)


def train(model, data_iter_fn, epochs=20, lr=0.003, momentum=0.9,
          weight_decay=0.0, milestones=None, steps_per_epoch=None, verbose=True):
    """Train a keynet_tpu Model; data_iter_fn(epoch) yields (images, labels)
    numpy batches.  Updates model.params in place and returns the model.
    With epoch `milestones`, `steps_per_epoch` (batches per epoch) is required
    so the LR decays at the reference's MultiStepLR epoch boundaries."""
    if milestones and not steps_per_epoch:
        raise ValueError("epoch milestones need steps_per_epoch to convert to "
                         "optimizer steps (optax schedules count steps)")
    tx = make_optimizer(lr, momentum, weight_decay, milestones,
                        steps_per_epoch=steps_per_epoch or 1)
    params = _params_pytree(model)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    for e in range(epochs):
        running, nb = 0.0, 0
        for images, labels in data_iter_fn(e):
            params, opt_state, l = step(params, opt_state,
                                        jnp.asarray(images), jnp.asarray(labels))
            running += float(l)
            nb += 1
        if verbose:
            print("Epoch %d - Training loss: %f" % (e, running / max(nb, 1)))
    model.params = {k: {kk: np.asarray(vv) for kk, vv in d.items()}
                    for k, d in params.items()}
    return model


def validate(model, data_iter, secret_sensor=None, secret_knet=None, verbose=True):
    """Top-1 accuracy; with (secret_sensor, secret_knet) the batch is encrypted
    and evaluated through the keynet instead (reference keynet/mnist.py:92-108
    `validate(..., secretkey)`)."""
    total, correct = 0, 0
    for images, labels in data_iter:
        if secret_knet is not None:
            xc = secret_sensor.fromtensor(images).encrypt().tensor()
            logits = np.asarray(secret_knet.forward(xc)).reshape(len(labels), -1)
        else:
            logits = np.asarray(model.forward(images))
        correct += int((logits.argmax(axis=1) == np.asarray(labels)).sum())
        total += len(labels)
    acc = correct / max(total, 1)
    if verbose:
        print("Mean classification accuracy = %f" % acc)
    return acc


# ------------------------------------------------------------------ sharding

def param_shardings(model, mesh, tp_axis="tp", min_tp_features=512):
    """NamedSharding tree: large Linear weights shard over tp (columns =
    in_features); everything else replicated."""
    tree = {}
    repl = NamedSharding(mesh, P())
    for l in model.layers:
        if l.name not in model.params:
            continue
        d = {}
        for k, v in model.params[l.name].items():
            if (isinstance(l, Linear) and k == "weight"
                    and l.in_features >= min_tp_features and tp_axis in mesh.axis_names
                    and l.in_features % mesh.shape[tp_axis] == 0):
                d[k] = NamedSharding(mesh, P(None, tp_axis))
            else:
                d[k] = repl
        tree[l.name] = d
    return tree


def make_sharded_train_step(model, tx, mesh, dp_axis="dp", tp_axis="tp"):
    """Training step jitted over a (dp, tp) mesh: batch rows shard over dp,
    large linear weights over tp; XLA inserts the ICI collectives (psum of
    tp partial products, dp gradient all-reduce)."""
    p_shard = param_shardings(model, mesh, tp_axis)
    batch_shard = NamedSharding(mesh, P(dp_axis, None, None, None))
    label_shard = NamedSharding(mesh, P(dp_axis))

    def step(params, opt_state, images, labels):
        def loss(p):
            logits = model.forward(images, params=p)
            return log_softmax_nll(logits, labels)
        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    jitted = jax.jit(step, in_shardings=(p_shard, None, batch_shard, label_shard),
                     out_shardings=(p_shard, None, None))
    return jitted, p_shard, batch_shard, label_shard
