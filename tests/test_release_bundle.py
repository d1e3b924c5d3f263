"""Self-published challenge bundle (round-3 VERDICT missing #3 / next #7):
build a keyed LeNet, release the public artifacts (npz keynet + encrypted PNG
+ embedding), then prove a COLD process holding only the bundle reproduces
the embedding — our analog of the reference's 2020 release
(reference demo/challenge.ipynb artifact flow)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "examples"))
    from release_challenge import build_bundle
    outdir = str(tmp_path_factory.mktemp("challenge"))
    build_bundle(outdir, seed=2020, verbose=False)
    return outdir


def test_bundle_contents_are_public_only(bundle):
    files = set(os.listdir(bundle))
    assert {"challenge_keynet.npz", "challenge_cipher.png",
            "challenge_embedding.npy", "MANIFEST.json"} <= files
    z = np.load(os.path.join(bundle, "challenge_keynet.npz"))
    manifest = json.loads(bytes(z["__manifest__"]).decode())
    assert manifest["include_keys"] is False
    assert not any(k.startswith(("imagekey", "embeddingkey", "sensor_"))
                   for k in z.files)


def test_cold_process_reproduces_embedding(bundle):
    """A fresh python process with ONLY the public bundle (no seed, no keys,
    no conversion state) must reproduce the published embedding bit-exactly."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from keynet_tpu import serialize\n"
        "from keynet_tpu.system import PublicKeyedSensor\n"
        "_, knet = serialize.load_keynet(%r)\n"
        "m = PublicKeyedSensor((1, 28, 28))\n"
        "y = np.asarray(knet.forward(m.load(%r).tensor()))\n"
        "y_pub = np.load(%r)\n"
        "assert y.shape == y_pub.shape\n"
        "assert np.array_equal(y, y_pub), np.abs(y - y_pub).max()\n"
        "print('COLD_OK', y.shape)\n"
        % (os.path.join(bundle, "challenge_keynet.npz"),
           os.path.join(bundle, "challenge_cipher.png"),
           os.path.join(bundle, "challenge_embedding.npy")))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=240)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "COLD_OK" in proc.stdout


def test_cipher_png_is_not_plaintext(bundle):
    """The released cipher must be visually scrambled relative to the secret
    image (permutation keys relocate pixels; mean abs pixel displacement)."""
    from PIL import Image
    cipher = np.asarray(Image.open(
        os.path.join(bundle, "challenge_cipher.png")).convert("L"), dtype=float)
    secret = np.asarray(Image.open(
        "/root/reference/demo/owl.jpg").convert("L").resize((28, 28)), dtype=float)
    c = (cipher - cipher.mean()) / (cipher.std() + 1e-9)
    s = (secret - secret.mean()) / (secret.std() + 1e-9)
    assert abs(float((c * s).mean())) < 0.5, "cipher correlates with plaintext"
