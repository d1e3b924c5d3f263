"""Load the reference's released 2020 cryptanalysis challenge artifact
(dill pickle of torch+scipy objects) into the keynet_tpu runtime and verify
the public encoding (reference demo/challenge.ipynb).

The device-op forward is checked against an independent host scipy forward
over the artifact's own CSR matrices.  (The notebook's committed output cell
differs from the shipped artifact by ~2e-3 — stale notebook output; both
runtimes agree with each other to float32 precision.)
"""

import numpy as np
import pytest

PKL = "/root/reference/demo/keynet_challenge_lenet_10AUG20.pkl"
PNG = "/root/reference/demo/keynet_challenge_lenet_10AUG20.png"


@pytest.fixture(scope="module")
def challenge():
    from keynet_tpu.challenge import load_challenge
    return load_challenge(PKL)


def test_challenge_structure(challenge):
    sensor, knet = challenge
    layers = knet.layers()
    assert list(layers) == ["conv1", "relu1", "pool1", "conv2", "relu2", "pool2",
                            "fc1", "relu3", "fc2", "relu4", "fc3"]
    # nnz of the released keynet (reference demo/challenge.ipynb printed model)
    assert layers["conv1"].nnz() == 45049
    assert layers["pool1"].nnz() == 11263
    assert layers["conv2"].nnz() == 156737
    assert layers["pool2"].nnz() == 7185
    assert knet.imagekey() is None and knet.embeddingkey() is None  # public


def test_challenge_public_encoding(challenge):
    sensor, knet = challenge
    xc = sensor.load(PNG).tensor()
    y = np.asarray(knet.forward(xc)).flatten()

    # independent host oracle: scipy CSR forward over the artifact matrices
    from keynet_tpu.challenge import _LegacyUnpickler, _extract_csr, _ShimKeyedLayer
    with open(PKL, "rb") as f:
        _, model_shim = _LegacyUnpickler(f).load()
    xT = np.asarray(xc, dtype=np.float32).T
    for name, child in model_shim.__dict__["_keynet"]._modules.items():
        if isinstance(child, _ShimKeyedLayer):
            xT = _extract_csr(child.__dict__["W"]) @ xT
            if "ReLU" in str(child.__dict__.get("_layertype", "")):
                xT = np.maximum(xT, 0)
        else:
            xT = np.maximum(xT, 0)
    y_ref = xT.flatten()[:-1]
    assert np.abs(y - y_ref).max() < 1e-5
    # and the ballpark of the notebook's recorded encoding
    exp = np.array([-0.0592, -0.0604, 0.0438, -0.0802, 0.0204,
                    0.0233, -0.0330, 0.0081, 0.0433, -0.0841])
    assert np.abs(y - exp).max() < 5e-3
