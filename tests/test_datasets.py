"""Real-format dataset loader tests: tiny IDX (MNIST) and python-pickle
(CIFAR-10) fixture files are written in the standard on-disk formats and read
back through keynet_tpu.datasets — validating the parsers the reference covers
via torchvision downloads (reference keynet/mnist.py:67, keynet/cifar10.py:86;
this environment is zero-egress so the fixtures are generated locally)."""

import gzip
import os
import pickle
import struct

import numpy as np

from keynet_tpu.datasets import load_mnist, load_cifar10, batches
from keynet_tpu.models.zoo import MNIST_MEAN, MNIST_STD, CIFAR10_MEAN, CIFAR10_STD


def _write_idx_images(path, arr, gz=False):
    """IDX3 ubyte: magic 0x00000803, dims, row-major bytes."""
    op = gzip.open if gz else open
    with op(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000803))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.astype(np.uint8).tobytes())


def _write_idx_labels(path, arr, gz=False):
    op = gzip.open if gz else open
    with op(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000801))
        f.write(struct.pack(">I", len(arr)))
        f.write(arr.astype(np.uint8).tobytes())


def test_mnist_idx_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (12, 28, 28)).astype(np.uint8)
    lbls = rng.integers(0, 10, 12).astype(np.uint8)
    _write_idx_images(str(tmp_path / "train-images-idx3-ubyte"), imgs)
    _write_idx_labels(str(tmp_path / "train-labels-idx1-ubyte"), lbls)

    x, y = load_mnist(root=str(tmp_path), train=True, normalize=False)
    assert x.shape == (12, 1, 28, 28) and x.dtype == np.float32
    np.testing.assert_allclose(x[:, 0] * 255.0, imgs.astype(np.float32), atol=1e-4)
    np.testing.assert_array_equal(y, lbls.astype(np.int32))

    xn, _ = load_mnist(root=str(tmp_path), train=True, normalize=True)
    np.testing.assert_allclose(xn, (x - MNIST_MEAN) / MNIST_STD, atol=1e-5)


def test_mnist_idx_gz_and_subdir(tmp_path):
    """torchvision layout: <root>/MNIST/raw/t10k-*-ubyte.gz."""
    d = tmp_path / "MNIST" / "raw"
    os.makedirs(str(d))
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (5, 28, 28)).astype(np.uint8)
    lbls = rng.integers(0, 10, 5).astype(np.uint8)
    _write_idx_images(str(d / "t10k-images-idx3-ubyte.gz"), imgs, gz=True)
    _write_idx_labels(str(d / "t10k-labels-idx1-ubyte.gz"), lbls, gz=True)

    x, y = load_mnist(root=str(tmp_path), train=False, normalize=False)
    assert x.shape == (5, 1, 28, 28)
    np.testing.assert_allclose(x[:, 0] * 255.0, imgs.astype(np.float32), atol=1e-4)
    np.testing.assert_array_equal(y, lbls.astype(np.int32))


def test_cifar10_batches_roundtrip(tmp_path):
    d = tmp_path / "cifar-10-batches-py"
    os.makedirs(str(d))
    rng = np.random.default_rng(5)
    all_data, all_lbls = [], []
    for i in range(1, 6):
        data = rng.integers(0, 256, (4, 3 * 32 * 32)).astype(np.uint8)
        lbls = rng.integers(0, 10, 4).tolist()
        with open(str(d / ("data_batch_%d" % i)), "wb") as f:
            pickle.dump({b"data": data, b"labels": lbls}, f)
        all_data.append(data)
        all_lbls.extend(lbls)

    x, y = load_cifar10(root=str(tmp_path), train=True, normalize=False)
    assert x.shape == (20, 3, 32, 32) and x.dtype == np.float32
    ref = np.concatenate(all_data).reshape(-1, 3, 32, 32).astype(np.float32) / 255.0
    np.testing.assert_allclose(x, ref, atol=1e-6)
    np.testing.assert_array_equal(y, np.asarray(all_lbls, dtype=np.int32))

    xn, _ = load_cifar10(root=str(tmp_path), train=True, normalize=True)
    mean = np.asarray(CIFAR10_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(CIFAR10_STD, np.float32).reshape(1, 3, 1, 1)
    np.testing.assert_allclose(xn, (ref - mean) / std, atol=1e-5)


def test_cifar10_test_batch(tmp_path):
    d = tmp_path / "cifar-10-batches-py"
    os.makedirs(str(d))
    rng = np.random.default_rng(6)
    data = rng.integers(0, 256, (7, 3 * 32 * 32)).astype(np.uint8)
    with open(str(d / "test_batch"), "wb") as f:
        pickle.dump({b"data": data, b"labels": rng.integers(0, 10, 7).tolist()}, f)
    x, y = load_cifar10(root=str(tmp_path), train=False, normalize=False)
    assert x.shape == (7, 3, 32, 32) and len(y) == 7


def test_synthetic_fallback_deterministic():
    x1, y1 = load_mnist(root=None, synthetic_n=64, seed=9)
    x2, y2 = load_mnist(root=None, synthetic_n=64, seed=9)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    assert x1.shape == (64, 1, 28, 28)


def test_batches_iterator():
    x = np.arange(10 * 4, dtype=np.float32).reshape(10, 4)
    y = np.arange(10, dtype=np.int32)
    it = batches(x, y, batch_size=4, shuffle=True, seed=0)
    seen = [yb for _, yb in it(0)]
    assert len(seen) == 2 and all(len(b) == 4 for b in seen)
    # epoch-indexed shuffles are reproducible
    seen2 = [yb for _, yb in it(0)]
    np.testing.assert_array_equal(np.concatenate(seen), np.concatenate(seen2))
