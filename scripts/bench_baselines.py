"""Measure the REFERENCE implementation's CPU numbers for the BASELINE.json
configs (keygen+conversion wall-clock, keyed-forward imgs/sec), by running the
actual reference code at /root/reference on this host.

Environment shims (this box has no network egress, no vipy, no numba, no cupy):
  * vipy  — minimal stub of the handful of utilities keynet imports
            (try_import / tolist / groupbyasdict / flatlist / Stopwatch / tempdir).
  * numba — identity @jit decorator (pure-Python fallback).  This slows the
            reference's *Toeplitz emission* (sparse.py:122) — conversion times
            are flagged `python_toeplitz` — but does NOT affect keygen or the
            forward hot loop (scipy COO dot, sparse.py:486-492), so the
            imgs/sec numbers are representative of the reference as shipped.
  * cupy  — unused stub (reference imports it lazily for a dead backend).

Usage:
  python scripts/bench_baselines.py [--configs lenet,allconv,cifar_bn,fiberbundle,vgg]
                                    [--out /tmp/reference_baselines.json]

The TPU-side numbers for the same configs come from scripts/bench_tpu_configs.py.
"""
import argparse
import json
import sys
import time
import types

import numpy as np


def install_stubs():
    # legacy numpy aliases the 2020-era reference relies on
    for alias, builtin in (("int", int), ("float", float), ("bool", bool),
                           ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, builtin)

    # ---- vipy ----
    vipy = types.ModuleType("vipy")
    vutil = types.ModuleType("vipy.util")

    def try_import(package, pipname=None, message=None):
        return True

    def tolist(x):
        return list(x) if isinstance(x, (list, tuple, set)) else [x]

    def flatlist(l):
        return [x for y in l for x in (y if isinstance(y, list) else [y])]

    def groupbyasdict(iterable, keyfunc):
        d = {}
        for x in iterable:
            d.setdefault(keyfunc(x), []).append(x)
        return d

    def tempdir():
        import tempfile
        return tempfile.gettempdir()

    class Stopwatch:
        def __init__(self):
            self.reset()

        def reset(self):
            self._t0 = time.time()
            return self

        def since(self, reset=False):
            t = time.time() - self._t0
            if reset:
                self.reset()
            return t

        def duration(self):
            return self.since()

    vutil.try_import = try_import
    vutil.tolist = tolist
    vutil.flatlist = flatlist
    vutil.groupbyasdict = groupbyasdict
    vutil.tempdir = tempdir
    vutil.Stopwatch = Stopwatch
    vimage = types.ModuleType("vipy.image")
    vipy.util = vutil
    vipy.image = vimage
    sys.modules["vipy"] = vipy
    sys.modules["vipy.util"] = vutil
    sys.modules["vipy.image"] = vimage

    # ---- numba (identity jit: pure-Python fallback) ----
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    numba.jit = jit
    numba.njit = jit
    numba.prange = range
    ntyped = types.ModuleType("numba.typed")
    ntyped.List = list
    numba.typed = ntyped
    sys.modules["numba"] = numba
    sys.modules["numba.typed"] = ntyped

    # ---- cupy (dead backend in the reference) ----
    for name in ("cupy", "cupyx", "cupyx.scipy", "cupyx.scipy.sparse"):
        sys.modules[name] = types.ModuleType(name)

    # ---- torchvision (only needed for dataset downloads, not the bench) ----
    def _permissive(name):
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **k: None

    tv = types.ModuleType("torchvision")
    for sub in ("datasets", "transforms"):
        m = types.ModuleType("torchvision." + sub)
        m.__getattr__ = _permissive  # permissive stub (non-dunder only)
        setattr(tv, sub, m)
        sys.modules["torchvision." + sub] = m
    sys.modules["torchvision"] = tv


def _forward_imgs_per_sec(knet, sensor, inshape, batches=(1, 64, 512), reps=3):
    """Keyed-forward throughput.  The reference's public forward only supports
    B=1 (linear_to_affine reshapes to the single-image outshape,
    system.py:132); batched numbers use the core layer pipeline
    (knet._keynet.forward) directly — generous to the reference."""
    import torch
    out = {}
    x1 = torch.randn(1, *inshape)
    xc1 = sensor.fromtensor(x1).encrypt().astensor()
    knet.forward(xc1)  # warm
    t0 = time.time()
    for _ in range(max(reps, 5)):
        knet.forward(xc1)
    out["B1"] = round(max(reps, 5) / (time.time() - t0), 1)
    core = getattr(knet, "_keynet", None)
    for B in batches:
        if B == 1 or core is None:
            continue
        x = torch.randn(B, *inshape)
        xc = sensor.fromtensor(x).encrypt().astensor()
        core.forward(xc)  # warm
        t0 = time.time()
        for _ in range(reps):
            core.forward(xc)
        dt = (time.time() - t0) / reps
        out["B%d_core" % B] = round(B / dt, 1)
    return out


def bench_lenet():
    import torch
    import keynet.system, keynet.mnist
    net = keynet.mnist.LeNet_AvgPool()
    net.load_state_dict(torch.load("/root/reference/models/mnist_lenet_avgpool.pth"))
    t0 = time.time()
    sensor, knet = keynet.system.PermutationKeynet(inshape=(1, 28, 28), net=net)
    t_build = time.time() - t0
    return {"keygen_convert_s": round(t_build, 2), "nnz": knet.num_parameters(),
            "imgs_per_sec": _forward_imgs_per_sec(knet, sensor, (1, 28, 28)),
            "note": "python_toeplitz (numba unavailable); forward unaffected"}


def _exec_model_from_tpu_keynet(make_keynet, inshape, batches=(1, 64), reps=3):
    """The reference cannot CONVERT big convs on this box (its Toeplitz
    emission is numba-jitted, sparse.py:122, and numba is unavailable — the
    pure-Python fallback needs hours at AllConvNet scale).  So the keyed
    matrices are built with keynet_tpu's emitter (bit-identical Ŵ) and the
    *reference execution model* — per-layer scipy CSR x dense on the host
    (sparse.py:486-492, layer.py:92) — is what gets timed."""
    import subprocess, tempfile, os, sys as _sys
    code = r'''
import json, sys, time
import numpy as np, scipy.sparse
import jax; jax.config.update("jax_platforms", "cpu")
import keynet_tpu as keynet
keynet.globals.GLOBAL["KEEP_HOST_NNZ"] = 10 ** 9
keynet.globals.GLOBAL["STREAM_NNZ"] = 10 ** 9  # materialize: exec model needs CSRs
%(make)s
sensor, knet = make_keynet(keynet)
mats, relus = [], []
for name, l in knet.layers().items():
    if l == "relu":
        relus[-1] = True
        continue
    assert l.W is not None, name
    mats.append(scipy.sparse.csr_matrix(l.W, dtype=np.float32))
    relus.append(l._relu)
out = {}
rng = np.random.default_rng(0)
for B in %(batches)s:
    x = np.concatenate([rng.standard_normal((B, mats[0].shape[1]-1), dtype=np.float32),
                        np.ones((B, 1), np.float32)], axis=1)
    def fwd(x):
        y = x.T
        for W, r in zip(mats, relus):
            y = W @ y
            if r:
                y = np.maximum(y, 0)
        return y
    fwd(x)
    t0 = time.time()
    for _ in range(%(reps)d):
        fwd(x)
    out["B%%d" %% B] = round(B * %(reps)d / (time.time() - t0), 1)
print("RESULT " + json.dumps(out))
''' % {"make": make_keynet, "batches": list(batches), "reps": reps}
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site")
    r = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3000, env=env)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(r.stdout[-1500:] + r.stderr[-1500:])


def bench_allconv_stochastic():
    """The stochastic AllConvNet keyed matrices are not materializable as
    single CSRs at all (the doubly-stochastic inverse's dense blocks fill
    W·A⁻¹ to ~1e9-1e10 nnz even at 32x32) — keynet_tpu runs this config only
    via its factored chains.  The honest reference baseline is therefore
    'cannot run'; reported here is the reference execution model on the
    PERMUTATION-keyed AllConvNet (same architecture, thin keys) as the
    nearest runnable config."""
    make = '''
def make_keynet(keynet):
    net = keynet.models.AllConvNet(seed=1)
    return keynet.PermutationKeynet((3, 32, 32), net, seed=0)
'''
    return {"imgs_per_sec": _exec_model_from_tpu_keynet(make, (3, 32, 32)),
            "note": "stochastic config unmaterializable as CSR; this row is "
                    "the permutation-keyed AllConvNet through the reference "
                    "execution model (scipy CSR chain)"}


def bench_cifar_bn():
    make = '''
def make_keynet(keynet):
    net = keynet.models.AllConvNet(batchnorm=True, seed=1)
    return keynet.PermutationKeynet((3, 32, 32), net, seed=0)
'''
    return {"imgs_per_sec": _exec_model_from_tpu_keynet(make, (3, 32, 32)),
            "note": "batchnorm-folded AllConvNet_bn, reference execution model"}


def bench_fiberbundle():
    import keynet.fiberbundle
    from PIL import Image
    rng = np.random.default_rng(0)
    img = Image.fromarray(np.uint8(rng.random((512, 512, 3)) * 255))
    t0 = time.time()
    keynet.fiberbundle.transform(img.convert("RGB"), (28, 28))
    t1 = time.time() - t0
    return {"transform_512_s": round(t1, 2),
            "note": "per-core python loop (reference keynet/fiberbundle.py)"}


def bench_vgg(budget_s=900):
    """The reference's tiled VGG-16 recipe at 224 — bounded attempt."""
    import multiprocessing
    import keynet.system, keynet.vgg, keynet.globals
    keynet.globals.num_processes(1)
    net = keynet.vgg.VGG16()
    t0 = time.time()
    try:
        import signal

        def alarm(sig, frame):
            raise TimeoutError

        signal.signal(signal.SIGALRM, alarm)
        signal.alarm(budget_s)
        sensor, knet = keynet.system.TiledOrthogonalKeynet((3, 224, 224), net, 224 // 16)
        signal.alarm(0)
        return {"keygen_convert_s": round(time.time() - t0, 2),
                "nnz": knet.num_parameters()}
    except TimeoutError:
        return {"keygen_convert_s": None,
                "note": "DID NOT COMPLETE within %ds (python_toeplitz; the "
                        "recipe is documented to need 48 processes and hours "
                        "even with numba)" % budget_s}
    except MemoryError:
        return {"keygen_convert_s": None, "note": "OOM"}


CONFIGS = {"lenet": bench_lenet, "allconv": bench_allconv_stochastic,
           "cifar_bn": bench_cifar_bn, "fiberbundle": bench_fiberbundle,
           "vgg": bench_vgg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="lenet,allconv,cifar_bn,fiberbundle")
    ap.add_argument("--out", default="/tmp/reference_baselines.json")
    args = ap.parse_args()
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import keynet.globals
    keynet.globals.verbose(False)
    results = {"host": "reference CPU (1 vCPU, numba/vipy stubbed)", "configs": {}}
    for name in args.configs.split(","):
        print("== %s ==" % name, flush=True)
        t0 = time.time()
        try:
            results["configs"][name] = CONFIGS[name]()
        except Exception as e:
            results["configs"][name] = {"error": "%s: %s" % (type(e).__name__, e)}
        print("   %s  (%.1fs)" % (results["configs"][name], time.time() - t0),
              flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
