"""Produce a self-published cryptanalysis challenge bundle — our analog of the
reference's 2020 release (reference demo/challenge.ipynb artifact flow:
public = (encrypted PNG, public embedding, public keynet); private = the
keygen seed, layer keys, and image key).

Bundle layout (written to --outdir, default /tmp/keynet_challenge):
  challenge_keynet.npz     public keynet (save_keynet include_keys=False)
  challenge_cipher.png     the encrypted secret image (mat2gray-rescaled)
  challenge_embedding.npy  public embedding = keynet.forward(marshal(png))
  MANIFEST.json            shapes + instructions

A cold process holding ONLY the bundle must reproduce the embedding:
  sensor = PublicKeyedSensor((1, 28, 28))
  _, knet = serialize.load_keynet('challenge_keynet.npz')
  y = knet.forward(sensor.load('challenge_cipher.png').tensor())
  assert y == np.load('challenge_embedding.npy')
(tests/test_release_bundle.py drives exactly this in a fresh process.)

    PYTHONPATH=. python examples/release_challenge.py [--outdir DIR] [--seed N]
"""

import argparse
import json
import os

import numpy as np

import keynet_tpu as keynet
from keynet_tpu import serialize
from keynet_tpu.system import PublicKeyedSensor

CHECKPOINT = "/root/reference/models/mnist_lenet_avgpool.pth"
SECRET_IMAGE = "/root/reference/demo/owl.jpg"   # stand-in secret message


def build_bundle(outdir, seed=2020, secret_image=SECRET_IMAGE, verbose=True):
    os.makedirs(outdir, exist_ok=True)
    net = keynet.models.LeNet_AvgPool()
    try:
        net.load_torch_state_dict(CHECKPOINT)
    except Exception:
        if verbose:
            print("(checkpoint unavailable; random weights)")

    # private: seed, keys, masks — all derived from `seed` and discarded here
    # (output encryption on: the published embedding is itself keyed)
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=seed,
                                            do_output_encryption=True)

    # encrypt the secret image and publish it as a PNG (mat2gray-as-key:
    # the [min,max]->[0,1] rescale is itself an invertible diagonal-affine
    # key composed into the PRIVATE decrypt key, reference keynet/system.py:173-181)
    sensor.load(secret_image).encrypt()
    png = os.path.join(outdir, "challenge_cipher.png")
    _, composed_decrypt_key = sensor.save(png)

    # holder-side sanity: the composed private key still decrypts the PNG
    # (the composed key is the FULL decrypt: load it into an identity sensor)
    check, _ = keynet.Keynet((1, 28, 28), net=None)
    dec = np.asarray(check.load(png, imagekey=composed_decrypt_key)
                     .decrypt().tensor())
    src = np.asarray(sensor.decrypt().tensor())
    assert np.abs(dec - src).max() < 2.0, "composed decrypt key failed"  # 8-bit PNG quantization

    # public keynet: no keys stored (serialize.save_keynet public mode,
    # the analog of KeyedModel.public(), reference keynet/system.py:147-151)
    npz = os.path.join(outdir, "challenge_keynet.npz")
    serialize.save_keynet(npz, knet, include_keys=False)

    # public embedding: forward of the MARSHALED png cipher (identical to
    # what any bundle holder computes — PNG quantization and all)
    marshal = PublicKeyedSensor((1, 28, 28))
    y = np.asarray(knet.forward(marshal.load(png).tensor(), outkey=None))
    emb = os.path.join(outdir, "challenge_embedding.npy")
    np.save(emb, y)

    manifest = {
        "inshape": [1, 28, 28],
        "model": "LeNet_AvgPool (topology public, weights private)",
        "files": {"keynet": "challenge_keynet.npz",
                  "cipher": "challenge_cipher.png",
                  "embedding": "challenge_embedding.npy"},
        "task": "recover the secret image given only these public artifacts",
        "reproduce": "PublicKeyedSensor((1,28,28)).load(cipher).tensor() -> "
                     "load_keynet(keynet).forward -> embedding",
    }
    with open(os.path.join(outdir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    if verbose:
        print("bundle written to %s" % outdir)
        print("  keynet nnz: %d   embedding shape: %s" % (knet.num_parameters(),
                                                          y.shape))
    return outdir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/keynet_challenge")
    ap.add_argument("--seed", type=int, default=2020)
    args = ap.parse_args()
    build_bundle(args.outdir, seed=args.seed)


if __name__ == "__main__":
    main()
