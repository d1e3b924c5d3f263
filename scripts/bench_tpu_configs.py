"""TPU-side numbers for the BASELINE.json configs (the counterpart of
scripts/bench_baselines.py, which measures the reference on this host's CPU).

Run on the TPU box:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_tpu_configs.py \
      [--out /tmp/tpu_baselines.json]

(The LeNet permutation config is also the driver bench, bench.py; VGG-224
numbers come from scripts/run_vgg_orth_224.py / run_vgg_stochastic_224.py.)
"""
import argparse
import json
import time

import numpy as np


def _fwd_imgs_per_sec(knet, sensor, inshape, batches=(1, 64, 1024), reps=5):
    out = {}
    for B in batches:
        x = np.random.default_rng(0).normal(size=(B, *inshape)).astype(np.float32)
        xc = sensor.fromtensor(x).encrypt().tensor()
        y = knet.forward(xc)
        y.block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            y = knet.forward(xc)
        y.block_until_ready()
        out["B%d" % B] = round(B * reps / (time.time() - t0), 1)
    return out


def bench_allconv_stochastic(keynet):
    net = keynet.models.AllConvNet(seed=1)
    t0 = time.time()
    sensor, knet = keynet.Keynet((3, 32, 32), net,
                                 global_geometric="hierarchical_permutation",
                                 hierarchical_blockshape=(2, 2),
                                 hierarchical_permute_at_level=(0, 1),
                                 local_geometric="doubly_stochastic", alpha=2,
                                 blocksize=8,
                                 local_photometric="uniform_random_affine",
                                 beta=1.0, gamma=1.0, seed=0)
    t_build = time.time() - t0
    return {"keygen_convert_s": round(t_build, 1), "nnz": knet.num_parameters(),
            "device_bytes": knet.device_bytes(),
            "imgs_per_sec": _fwd_imgs_per_sec(knet, sensor, (3, 32, 32))}


def bench_cifar_bn(keynet):
    net = keynet.models.AllConvNet(batchnorm=True, seed=1)
    t0 = time.time()
    sensor, knet = keynet.PermutationKeynet((3, 32, 32), net, seed=0)
    t_build = time.time() - t0
    return {"keygen_convert_s": round(t_build, 1), "nnz": knet.num_parameters(),
            "device_bytes": knet.device_bytes(),
            "imgs_per_sec": _fwd_imgs_per_sec(knet, sensor, (3, 32, 32))}


def bench_fiberbundle(keynet):
    rng = np.random.default_rng(0)
    img = np.uint8(rng.random((512, 512, 3)) * 255)
    t0 = time.time()
    keynet.fiberbundle.simulation(img)
    t_sim = time.time() - t0
    from PIL import Image
    t0 = time.time()
    keynet.fiberbundle.transform(img, (28, 28))
    t_tr = time.time() - t0
    # keyed LeNet on the fiberbundle-retrained checkpoint
    net = keynet.models.LeNet_AvgPool().load_torch_state_dict(
        "/root/reference/models/mnist_lenet_avgpool_fiberbundle.pth")
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=0)
    return {"simulation_512_s": round(t_sim, 3), "transform_512_s": round(t_tr, 3),
            "keyed_imgs_per_sec": _fwd_imgs_per_sec(knet, sensor, (1, 28, 28),
                                                    batches=(1024,))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpu_baselines.json")
    ap.add_argument("--configs", default="allconv,cifar_bn,fiberbundle")
    args = ap.parse_args()
    import keynet_tpu as keynet
    import jax
    cfgs = {"allconv": bench_allconv_stochastic, "cifar_bn": bench_cifar_bn,
            "fiberbundle": bench_fiberbundle}
    results = {"device": str(jax.devices()), "configs": {}}
    for name in args.configs.split(","):
        print("== %s ==" % name, flush=True)
        t0 = time.time()
        try:
            results["configs"][name] = cfgs[name](keynet)
        except Exception as e:
            results["configs"][name] = {"error": "%s: %s" % (type(e).__name__, e)}
        print("   %s  (%.1fs)" % (results["configs"][name], time.time() - t0),
              flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
