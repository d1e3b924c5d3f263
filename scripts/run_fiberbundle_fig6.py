"""Figure-6 fiber-bundle protocol, end to end (reference demo/figures.py:121-179
`train_mnist_lenet_avgpool_fiberbundle`):

  1. simulate the MNIST set through the fiber-bundle optics
     (keynet_tpu.fiberbundle.transform), estimating the normalization
     constants from the simulated train set (or reuse the published pair),
  2. validate the raw-trained checkpoint on simulated imagery (the "sim"
     column degradation),
  3. re-train LeNet_AvgPool on simulated imagery (lr 0.004, 40 epochs in the
     paper protocol),
  4. validate the re-trained net, alongside the reference's shipped
     mnist_lenet_avgpool_fiberbundle.pth as the oracle,
  5. keyed-validate the re-trained net through a PermutationKeynet — the
     Fig.-6 "keynet" column: keyed accuracy == source accuracy.

Zero-egress note: with no MNIST IDX files on disk the loader falls back to a
deterministic synthetic set; every step of the protocol still runs.

  python scripts/run_fiberbundle_fig6.py [--mnist-root DIR] [--epochs N]
                                         [--n-train N] [--n-test N]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import keynet_tpu as keynet
from keynet_tpu.datasets import load_mnist, batches
from keynet_tpu.models.zoo import (LeNet_AvgPool, MNIST_FIBERBUNDLE_MEAN,
                                   MNIST_FIBERBUNDLE_STD, MNIST_MEAN, MNIST_STD)
from keynet_tpu.train import train, validate

RAW_PTH = "/root/reference/models/mnist_lenet_avgpool.pth"
FB_PTH = "/root/reference/models/mnist_lenet_avgpool_fiberbundle.pth"


def simulate_set(x, seed=0, verbose=True):
    """Push (N,1,28,28) float images in [0,1] through the fiber-bundle optics;
    returns (N,1,28,28) float32 in [0,1] (reference figures.py:131-136
    transform chain: RGB -> fiberbundle.transform -> grayscale -> 28x28)."""
    out = np.empty_like(x, dtype=np.float32)
    t0 = time.time()
    for i in range(len(x)):
        img = np.uint8(np.clip(x[i, 0] * 255.0, 0, 255))
        rgb = np.repeat(img[:, :, None], 3, axis=2)
        sim = keynet.fiberbundle.transform(rgb, outshape=(28, 28), seed=seed + i)
        out[i, 0] = np.asarray(sim, dtype=np.float32).mean(axis=2) / 255.0
        if verbose and i and i % 2000 == 0:
            print("  simulated %d/%d (%.1f img/s)" % (i, len(x), i / (time.time() - t0)))
    return out


def run(mnist_root=None, epochs=40, n_train=None, n_test=None, lr=0.004,
        batch_size=32, verbose=True, seed=0):
    # raw sets are normalized for step 2; simulation wants raw [0,1] pixels
    xtr_raw, ytr = load_mnist(root=mnist_root, train=True, normalize=False, seed=seed)
    xte_raw, yte = load_mnist(root=mnist_root, train=False, normalize=False, seed=seed)
    if n_train:
        xtr_raw, ytr = xtr_raw[:n_train], ytr[:n_train]
    if n_test:
        xte_raw, yte = xte_raw[:n_test], yte[:n_test]

    print("simulating %d train + %d test images through the fiber bundle..."
          % (len(ytr), len(yte)))
    str_ = simulate_set(xtr_raw, seed=seed, verbose=verbose)
    ste = simulate_set(xte_raw, seed=seed + 10 ** 6, verbose=verbose)

    # 1. normalization constants from the simulated train set
    #    (reference figures.py:138-147; published pair figures.py:153)
    mu, std = float(str_.mean()), float(str_.std())
    print("estimated sim constants: mu=%.8f std=%.8f (published %.8f %.8f)"
          % (mu, std, MNIST_FIBERBUNDLE_MEAN, MNIST_FIBERBUNDLE_STD))
    xtr = (str_ - mu) / std
    xte = (ste - mu) / std

    results = {"mu": mu, "std": std}

    # 2. raw-trained checkpoint on simulated imagery
    if os.path.exists(RAW_PTH):
        raw = LeNet_AvgPool().load_torch_state_dict(RAW_PTH)
        acc = validate(raw, batches(xte, yte, batch_size, shuffle=False)(0), verbose=False)
        results["raw_ckpt_on_sim"] = acc
        print("raw-trained checkpoint on sim imagery: %.4f" % acc)

    # 3. retrain on simulated imagery (paper: lr 0.004, 40 epochs,
    #    reference figures.py:175 via keynet.cifar10.train)
    net = LeNet_AvgPool(seed=seed)
    steps = max(1, (len(ytr) - batch_size + 1 + batch_size - 1) // batch_size)
    train(net, batches(xtr, ytr, batch_size, seed=seed), epochs=epochs, lr=lr,
          steps_per_epoch=steps, verbose=verbose)

    # 4. validate the retrained net + the reference's shipped oracle
    acc = validate(net, batches(xte, yte, batch_size, shuffle=False)(0), verbose=False)
    results["retrained_on_sim"] = acc
    print("retrained net on sim imagery: %.4f" % acc)
    if os.path.exists(FB_PTH):
        oracle = LeNet_AvgPool().load_torch_state_dict(FB_PTH)
        acc_o = validate(oracle, batches(xte, yte, batch_size, shuffle=False)(0), verbose=False)
        results["reference_fb_ckpt_on_sim"] = acc_o
        print("reference fiberbundle checkpoint on sim imagery: %.4f" % acc_o)

    # 5. keyed-validate the retrained net (Fig.-6 "keynet" column)
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=seed)
    acc_k = validate(None, batches(xte, yte, batch_size, shuffle=False)(0),
                     secret_sensor=sensor, secret_knet=knet, verbose=False)
    results["retrained_keyed"] = acc_k
    print("retrained net, keyed forward: %.4f (source %.4f)"
          % (acc_k, results["retrained_on_sim"]))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mnist-root", default=None,
                    help="directory with MNIST IDX files (synthetic fallback if absent)")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n-train", type=int, default=None)
    ap.add_argument("--n-test", type=int, default=None)
    a = ap.parse_args()
    run(mnist_root=a.mnist_root, epochs=a.epochs, n_train=a.n_train, n_test=a.n_test)
