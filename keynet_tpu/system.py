"""Public Key-Net API: KeyedModel, KeyedSensor and named keynet factories.

Mirrors the reference public surface (keynet/system.py) on a TPU-native
runtime: the converter walks a declarative model spec (no torch hooks), fuses
batchnorm, folds ReLU keys into the preceding linear layer, removes dropout,
and keys every remaining layer as Ŵ = A·W·A⁻¹; the resulting keynet executes
as one jitted XLA program with all keyed matrices device-resident.
"""

from collections import OrderedDict

import numpy as np
import scipy.sparse
import jax
import jax.numpy as jnp

from .globals import vprint
from .util import find_closest_positive_divisor  # noqa: F401  (public re-export)
from .homogeneous import affine_to_linear, linear_to_affine, mat2gray_key
from .keys import keygen, identity_matrix
from .layer import KeyedLayer
from .ops.operators import materialize
from .models import specs
from . import fiberbundle as _fiberbundle

_DEFAULT_KEY = object()  # sentinel: "use the model's embedding key"


def fuse_conv2d_and_bn(conv_w, conv_b, bn_mean, bn_var, bn_eps, bn_w, bn_b):
    """Fold an inference-mode batchnorm into the preceding conv's weights
    (same algebra as reference keynet/torch.py:99-113):
      w' = w * g/sqrt(var+eps),  b' = (b - mean) * g/sqrt(var+eps) + beta."""
    scale = np.asarray(bn_w) / np.sqrt(np.asarray(bn_var) + np.float32(bn_eps))
    w = np.asarray(conv_w) * scale.reshape(-1, 1, 1, 1)
    b = np.asarray(conv_b) if conv_b is not None else np.zeros_like(bn_mean)
    b = (b - np.asarray(bn_mean)) * scale + np.asarray(bn_b)
    return w.astype(np.float32), b.astype(np.float32)


def repair_tileshape(tileshape):
    """Snap a requested tileshape to the nearest MXU-lane-compatible device
    tile (each dim a divisor of 128 >= 4, or a multiple of 128).

    Semantics note (VERDICT round-2 #5): the reference repairs tileshape to
    non-ragged spatial divisors because its TiledMatrix cannot tile ragged
    edges (reference keynet/system.py:303-314, sparse.py:517); our Block-ELL
    packer zero-pads edge tiles natively, so the only hardware constraint is
    MXU/VPU lane alignment.  The repaired value IS the device tile: it sets
    Block-ELL granularity and therefore device bytes and dedup behavior."""
    if tileshape is None:
        return None
    allowed = [4, 8, 16, 32, 64] + [128 * k for k in range(1, 65)]

    def snap(t):
        return min(allowed, key=lambda a: (abs(a - int(t)), -a))
    snapped = (snap(tileshape[0]), snap(tileshape[1]))
    if snapped != tuple(tileshape):
        vprint("[keynet_tpu.layergen]: tileshape %s is not MXU-lane aligned; "
               "using device tileshape %s (allowed: divisors of 128 >= 4 and "
               "multiples of 128)" % (tuple(tileshape), snapped))
    return snapped


def layergen(module, inshape, outshape, A, Ainv, params=None, tileshape=None,
             backend="jax", rng=None, mask_alpha=None):
    """KeyedLayer factory with MXU-aligned tileshape repair (see
    repair_tileshape; reference analog keynet/system.py:303-314).  ``rng``
    seeds the secret conversion-time masks (split/masked re-keying) for
    reproducible artifacts; ``mask_alpha`` scales the mask strength with the
    keygen alpha privacy parameter (>= GLOBAL['MASK_ALPHA'] floor)."""
    tileshape = repair_tileshape(tileshape)
    if backend != "jax":
        raise ValueError("invalid backend '%s' (keynet_tpu supports 'jax')" % backend)
    return KeyedLayer(module, inshape, outshape, A, Ainv, params=params,
                      tileshape=tileshape, rng=rng, mask_alpha=mask_alpha)


def _conversion_device():
    """Device context for conversion-time array work.

    Conversion is host numpy/scipy work punctuated by small selfcheck
    ``op.apply`` calls and hundreds of small factor uploads.  When the default
    backend is a remote accelerator (the axon TPU tunnel), each selfcheck is a
    fresh XLA compile through the tunnel (~30 s) and each upload a network
    roundtrip — measured 652 s for the cifar_bn conversion vs 5.4 s on the
    CPU backend.  Build everything on the in-process CPU backend instead;
    ``KeyedModel._build`` moves the finished op pytree to the accelerator in
    one ``device_put``."""
    from contextlib import nullcontext
    if jax.default_backend() == "cpu":
        return nullcontext()
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return nullcontext()
    return jax.default_device(cpu)


class KeyedModel:
    """Convert a source model spec into a keynet (reference keynet/system.py:26-157).

    The conversion walks the layer graph:
      * dropout layers are deleted from the graph (identity at inference);
      * 'xyz_bn' batchnorms are fused into conv 'xyz', keyed with the bn outkey;
      * ReLU outkeys (restricted to non-negative monotone families so ReLU
        commutes) are applied to the preceding layer, leaving a plain
        elementwise ReLU; a ReLU following a fused batchnorm is keyed
        explicitly;
      * every other layer becomes a KeyedLayer with Ŵ = A_out · W · A_in⁻¹.
    """

    def __init__(self, net, inshape, inkey, f_layername_to_keypair,
                 f_module_to_keyedmodule=None, do_output_encryption=False):
        shapes = net.netshape()

        # --- remove dropout nodes (doubly-linked-list deletion) -------------
        dropouts = {l.name for l in net.layers if isinstance(l, specs.Dropout)}
        for v in shapes.values():
            while v["nextlayer"] in dropouts:
                v["nextlayer"] = shapes[v["nextlayer"]]["nextlayer"]
            while v["prevlayer"] in dropouts:
                v["prevlayer"] = shapes[v["prevlayer"]]["prevlayer"]

        # --- per-layer output keypairs (LAZY + memoized) ---------------------
        # A conv/linear immediately followed by relu never uses its own
        # outkeypair: the folded layer takes the relu's (restricted) key as A,
        # and the next layer's Ainv comes from the relu interface too.  Eager
        # generation burned ~390 s of the stochastic VGG-224 conversion on
        # dense-block inverse emissions for keypairs that were thrown away
        # (profiled: 8 unused emit_pba_fill calls at ~49 s each).  Keys are
        # drawn from the shared rng stream at first use, so a seeded
        # conversion stays deterministic (order of CONSUMED interfaces).
        first = shapes["input"]["nextlayer"]
        last = shapes["output"]["prevlayer"]
        kp_names = [k for k in shapes
                    if k not in ("input", "output") and k not in dropouts]
        kp_cache = {}

        def _outkeypair(k):
            if k not in kp_cache:
                kp_cache[k] = f_layername_to_keypair(k, shapes[k]["outshape"])
            return kp_cache[k]

        class _LayerKey:
            """Lazy view of {'A': ..., 'Ainv': ...} for one layer."""
            __slots__ = ("k",)

            def __init__(self, k):
                self.k = k

            def __getitem__(self, which):
                if which == "A":
                    return _outkeypair(self.k)[0] \
                        if (self.k != last or do_output_encryption) else None
                prev = shapes[self.k]["prevlayer"]
                return inkey if prev == "input" else _outkeypair(prev)[1]

        layerkey = {k: _LayerKey(k) for k in kp_names}
        self._imagekey = inkey
        self._embeddingkey = _outkeypair(last)[1] if do_output_encryption else None

        # --- walk the spec and key each layer --------------------------------
        import time as _time
        keyed = OrderedDict()
        with _conversion_device():
            self._key_layers(net, shapes, layerkey, keyed,
                             f_module_to_keyedmodule, _time)
        self._layers = keyed
        self._outshape = shapes["output"]["outshape"]
        self._forward = None  # lazily-built jitted program
        self._embeddingkey_op = None

    def _key_layers(self, net, shapes, layerkey, keyed,
                    f_module_to_keyedmodule, _time):
        for l in net.layers:
            k = l.name
            if isinstance(l, specs.Dropout):
                continue
            _t0 = _time.perf_counter()
            vprint('[keynet_tpu.KeyedModel]: keying "%s"' % k)

            if isinstance(l, specs.BatchNorm2d):
                assert k.endswith("_bn"), \
                    "batchnorm layers must be named 'xyz_bn' for conv 'xyz'"
                k_prev = k[:-3]
                assert shapes[k]["prevlayer"] == k_prev, \
                    "'%s' must directly follow '%s'" % (k, k_prev)
                conv = net.layer(k_prev)
                p_bn, p_conv = net.params[k], net.params[k_prev]
                w, b = fuse_conv2d_and_bn(p_conv["weight"], p_conv.get("bias"),
                                          p_bn["running_mean"], p_bn["running_var"],
                                          l.eps, p_bn["weight"], p_bn["bias"])
                keyed[k_prev] = f_module_to_keyedmodule(
                    conv, shapes[k_prev]["inshape"], shapes[k]["outshape"],
                    layerkey[k]["A"], layerkey[k_prev]["Ainv"],
                    params={"weight": w, "bias": b})
                vprint("[keynet_tpu.KeyedModel]:     %r" % keyed[k_prev])

            elif isinstance(l, specs.ReLU):
                k_prev = shapes[k]["prevlayer"]
                if not k_prev.endswith("_bn"):
                    # fold the (commuting) relu outkey into the previous layer
                    prev = net.layer(k_prev)
                    keyed[k_prev] = f_module_to_keyedmodule(
                        prev, shapes[k_prev]["inshape"], shapes[k_prev]["outshape"],
                        layerkey[k]["A"], layerkey[k_prev]["Ainv"],
                        params=net.params.get(k_prev))
                    keyed[k] = "relu"  # plain elementwise relu marker
                    vprint("[keynet_tpu.KeyedModel]:     %r + ReLU" % keyed[k_prev])
                else:
                    # previous layer already keyed by bn fusion: explicit keyed relu
                    keyed[k] = KeyedLayer(l, shapes[k]["inshape"], shapes[k]["outshape"],
                                          layerkey[k]["A"], layerkey[k]["Ainv"])
                    vprint("[keynet_tpu.KeyedModel]:     %r" % keyed[k])

            elif (shapes[k]["nextlayer"] is not None
                  and shapes[k]["nextlayer"] != "output"
                  and (shapes[k]["nextlayer"] == k + "_bn"
                       or isinstance(net.layer(shapes[k]["nextlayer"]), specs.ReLU))):
                pass  # keyed later, merged with its bn/relu successor

            else:
                keyed[k] = f_module_to_keyedmodule(
                    l, shapes[k]["inshape"], shapes[k]["outshape"],
                    layerkey[k]["A"], layerkey[k]["Ainv"], params=net.params.get(k))
                vprint("[keynet_tpu.KeyedModel]:     %r" % keyed[k])
            if k in keyed or (k.endswith("_bn")):
                vprint("[keynet_tpu.KeyedModel]:     %.1fs" % (_time.perf_counter() - _t0))

    @classmethod
    def from_layers(cls, layers, outshape, imagekey=None, embeddingkey=None):
        """Assemble a KeyedModel directly from an OrderedDict of KeyedLayer /
        'relu' entries (deserialization path, e.g. the challenge artifact)."""
        self = cls.__new__(cls)
        self._layers = OrderedDict(layers)
        self._outshape = tuple(outshape)
        self._imagekey = imagekey
        self._embeddingkey = embeddingkey
        self._forward = None
        self._embeddingkey_op = None
        return self

    # ----------------------------------------------------------------- runtime
    def _build(self):
        if self._forward is not None:
            return
        stages = []   # static plan: 'relu' | ('op', fused_relu_flag, name)
        ops = []
        for name, l in self._layers.items():
            if l == "relu":
                stages.append("relu")
            else:
                stages.append(("op", bool(l._relu), name))
                ops.append(l.op())

        def run(ops_, x):
            i = 0
            for stage in stages:   # static python plan, unrolled at trace time
                if stage == "relu":
                    x = jnp.maximum(x, 0.0)
                else:
                    # named_scope -> device-trace attribution per layer
                    # (docs/SERVING.md per-link breakdowns)
                    with jax.named_scope("%s.%s" % (
                            stage[2], type(ops_[i]).__name__)):
                        x = ops_[i].apply(x)
                    if stage[1]:
                        x = jnp.maximum(x, 0.0)
                    i += 1
            return x

        ops = tuple(ops)
        if jax.default_backend() != "cpu":
            # conversion built the op arrays on the in-process CPU backend
            # (_conversion_device); commit the whole pytree to the accelerator
            # in one transfer so forwards never re-upload.
            ops = jax.device_put(ops, jax.devices()[0])
        self._ops = ops
        self._forward_fn = run          # un-jitted body (for custom jit/sharding)
        self._forward = jax.jit(run)

    def forward(self, img_cipher, outkey=_DEFAULT_KEY):
        """Run the keynet on an encrypted homogeneous batch (N, D+1) and return
        the decrypted affine output reshaped to (N, *outshape) — or the raw
        cipher embedding when no key is supplied/held (public release)."""
        self._build()
        y = self._forward(self._ops, jnp.asarray(img_cipher, dtype=jnp.float32))
        key = self._embeddingkey if outkey is _DEFAULT_KEY else outkey
        if key is not None:
            y = self.decrypt(y, key)
        out = linear_to_affine(y, None)
        C, H, W = self._outshape
        return out.reshape((-1, C, H, W)) if (H, W) != (1, 1) else out

    __call__ = forward

    def decrypt(self, y_cipher, outkey=_DEFAULT_KEY):
        key = self._embeddingkey if outkey is _DEFAULT_KEY else outkey
        if key is None:
            return y_cipher
        if key is self._embeddingkey:
            if self._embeddingkey_op is None:
                self._embeddingkey_op = materialize(scipy.sparse.csr_matrix(key))
            op = self._embeddingkey_op
        else:
            op = materialize(scipy.sparse.csr_matrix(key))
        return op.apply(jnp.asarray(y_cipher, dtype=jnp.float32))

    # ------------------------------------------------------------------- keys
    def imagekey(self):
        return self._imagekey

    def embeddingkey(self):
        return self._embeddingkey

    def public(self):
        """Strip private keys before release (reference keynet/system.py:147-151)."""
        self._imagekey = None
        self._embeddingkey = None
        self._embeddingkey_op = None
        return self

    # -------------------------------------------------------------- accounting
    def num_parameters(self):
        return int(sum(l.nnz() for l in self._layers.values() if isinstance(l, KeyedLayer)))

    def device_bytes(self):
        return int(sum(l.device_bytes() for l in self._layers.values()
                       if isinstance(l, KeyedLayer)))

    def layers(self):
        return self._layers

    def __repr__(self):
        lines = ["<keynet_tpu.KeyedModel:"]
        for name, l in self._layers.items():
            lines.append("  (%s): %s" % (name, "ReLU()" if l == "relu" else repr(l)))
        return "\n".join(lines) + "\n>"


class KeyedSensor(KeyedLayer):
    """Keyed optical sensor: holds an image tensor and its encryption keypair
    (reference keynet/system.py:160-263).  Fluent API:
    sensor.load(imgfile).encrypt().tensor()."""

    def __init__(self, inshape, keypair):
        assert isinstance(inshape, tuple) and len(inshape) == 3
        self._encryptkey, self._decryptkey = keypair
        self._inshape = (1, *inshape)
        self._tensor = None
        self._layertype = "input"
        self._relu = False
        self._repr = "KeyedSensor"
        self.W = scipy.sparse.csr_matrix(self._encryptkey).astype(np.float32)
        self.shape = self.W.shape
        self._op = materialize(self.W)
        self._decrypt_op = None

    def __repr__(self):
        return "<keynet_tpu.KeyedSensor: height=%d, width=%d, channels=%d>" % (
            self._inshape[2], self._inshape[3], self._inshape[1])

    # ------------------------------------------------------------------ image io
    def load(self, imgfile, imagekey=None):
        from PIL import Image
        im = Image.open(imgfile)
        C, H, W = self._inshape[1:]
        if imagekey is not None:
            # load an already-encrypted PNG saved by .save(); undo mat2gray
            if C == 1:
                im = im.split()[0]
            arr = np.asarray(im, dtype=np.float32) / 255.0
            x = arr[None, None] if arr.ndim == 2 else arr.transpose(2, 0, 1)[None]
            x_lin = np.asarray(affine_to_linear(x))
            x_lin = np.asarray(scipy.sparse.csr_matrix(imagekey) @ x_lin.T).T
            self._tensor = jnp.asarray(x_lin, dtype=jnp.float32)
        else:
            im = im.resize((W, H))
            im = im.convert("L") if C == 1 else im.convert("RGB")
            arr = np.asarray(im, dtype=np.float32)
            arr = arr[None] if arr.ndim == 2 else arr.transpose(2, 0, 1)
            self._tensor = jnp.asarray(arr[None])  # 1xCxHxW in [0,255]
        return self

    def fromimage(self, im):
        arr = np.asarray(im, dtype=np.float32)
        arr = arr[None] if arr.ndim == 2 else arr.transpose(2, 0, 1)
        assert (1, *arr.shape) == self._inshape
        self._tensor = jnp.asarray(arr[None])
        return self

    def fromtensor(self, x):
        if x is not None:
            self._tensor = jnp.asarray(np.asarray(x), dtype=jnp.float32)
        return self

    def tensor(self):
        return self._tensor[None] if self._tensor.ndim == 3 else self._tensor

    astensor = tensor
    totensor = tensor

    def asimage(self):
        """Return the current tensor as a uint8 HxWxC numpy image (mat2gray)."""
        x = self._tensor
        if self.isencrypted():
            x = x[:, :-1]
        x = np.asarray(x).reshape(self._inshape[1:])
        x = (x - x.min()) / max(x.max() - x.min(), 1e-12)
        img = (255 * x).astype(np.uint8)
        return img.transpose(1, 2, 0) if img.shape[0] == 3 else img[0]

    toimage = asimage

    def show(self):
        from PIL import Image
        Image.fromarray(self.asimage()).show()
        return self

    def save(self, outfile="/tmp/keynet_cipher.png"):
        """Save the encrypted image as a PNG by composing a mat2gray
        normalization key into the decrypt key (reference keynet/system.py:173-181).
        Returns (outfile, composed_decrypt_key)."""
        from PIL import Image
        assert self.isencrypted()
        x_lin = np.asarray(self._tensor).T          # (D+1, 1) column
        A, Ainv = mat2gray_key(x_lin[:-1].ravel())
        x_gray = (A @ x_lin).T                      # in [0,1], trailing 1
        arr = x_gray[:, :-1].reshape(self._inshape[1:])
        img = (255 * np.clip(arr, 0, 1)).astype(np.uint8)
        img = img.transpose(1, 2, 0) if img.shape[0] == 3 else img[0]
        Image.fromarray(img).save(outfile)
        return outfile, scipy.sparse.csr_matrix(self._decryptkey) @ Ainv

    # ----------------------------------------------------------------- crypto
    def keypair(self):
        return (self._encryptkey, self._decryptkey)

    def key(self):
        return self._decryptkey

    def isloaded(self):
        return self._tensor is not None

    def isencrypted(self):
        """Encrypted = homogeneous 1x(C*H*W+1) row (reference keynet/system.py:243-245)."""
        return self.isloaded() and self._tensor.ndim == 2 and \
            self._tensor.shape == (self._tensor.shape[0], int(np.prod(self._inshape[1:])) + 1)

    def encrypt(self):
        assert self.isloaded(), "load image first"
        if not self.isencrypted():
            self._tensor = self.forward(affine_to_linear(self._tensor))
        return self

    def decrypt(self):
        assert self.isloaded(), "load image first"
        if self.isencrypted():
            if self._decrypt_op is None:
                self._decrypt_op = materialize(scipy.sparse.csr_matrix(self._decryptkey))
            x = self._decrypt_op.apply(self._tensor)
            self._tensor = linear_to_affine(x).reshape(
                (-1, *self._inshape[1:]))
        return self


class PublicKeyedSensor(KeyedSensor):
    """Identity-keyed sensor used to marshal already-encrypted challenge images
    (reference keynet/system.py:266-284)."""

    def __init__(self, inshape):
        n = int(np.prod(inshape)) + 1
        super().__init__(inshape, (identity_matrix(n), identity_matrix(n)))

    def __repr__(self):
        return "<keynet_tpu.PublicKeyedSensor: height=%d, width=%d, channels=%d>" % (
            self._inshape[2], self._inshape[3], self._inshape[1])

    def encrypt(self):
        raise ValueError("PublicKeyedSensor has no encryption keys")

    def decrypt(self):
        raise ValueError("PublicKeyedSensor has no decryption keys")

    def tensor(self):
        assert self.isloaded(), "load image first"
        if not self.isencrypted():
            self._tensor = self.forward(affine_to_linear(self._tensor))
        return self._tensor


class OpticalFiberBundle(KeyedSensor):
    """Sensor whose load() runs the fiber-bundle optical simulation
    (reference keynet/system.py:287-300; fixes the reference's broken
    OpticalFiberBundleKeynet wiring at keynet/system.py:512-516)."""

    def __init__(self, inshape=(3, 512, 512), keypair=None):
        if keypair is None:
            keypair = keygen(inshape)
        super().__init__(inshape, keypair)

    def load(self, imgfile):
        from PIL import Image
        N, C, H, W = self._inshape
        im = Image.open(imgfile).convert("RGB")
        scale = max(H, W) / max(im.size)
        im = im.resize((max(1, round(im.size[0] * scale)), max(1, round(im.size[1] * scale))))
        arr = np.asarray(im)
        # center crop to (H, W)
        i0 = max(0, (arr.shape[0] - H) // 2)
        j0 = max(0, (arr.shape[1] - W) // 2)
        arr = arr[i0:i0 + H, j0:j0 + W]
        sim = _fiberbundle.simulation(arr, h_xtalk=0.05, v_xtalk=0.05,
                                      fiber_core_x=16, fiber_core_y=16,
                                      do_camera_noise=True)
        self._sim_image = np.uint8(np.clip(sim, 0, 255))
        self._tensor = jnp.asarray(self._sim_image.transpose(2, 0, 1)[None].astype(np.float32))
        return self

    def image(self):
        return self._sim_image


# -------------------------------------------------------------------- factories

def Keynet(inshape, net=None, backend="jax", global_photometric="identity",
           local_photometric="identity", global_geometric="identity",
           local_geometric="identity", memoryorder="channel",
           do_output_encryption=False, alpha=None, beta=None, gamma=None,
           hierarchical_blockshape=None, hierarchical_permute_at_level=None,
           blocksize=None, tileshape=None, seed=None):
    """Build (sensor, keynet) with per-layer keys drawn from the configured
    families.  ReLU layers receive keys restricted to families that commute
    with ReLU (reference keynet/system.py:472-486)."""
    rng = np.random.default_rng(seed)
    # Secret-mask rng, derived from the same seed but on an independent stream
    # (SeedSequence spawn key) so mask draws never perturb the key stream and
    # a seeded conversion is bit-reproducible end to end.
    mask_rng = np.random.default_rng(
        np.random.SeedSequence(entropy=seed, spawn_key=(1,)) if seed is not None
        else None)

    def f_keypair(layername, shape):
        relu = "relu" in layername
        return keygen(
            shape,
            global_photometric=global_photometric if not relu or global_photometric == "identity" else "identity",
            local_photometric=local_photometric if not relu or local_photometric == "identity" else "uniform_random_gain",
            global_geometric=global_geometric if not relu or global_geometric == "identity" else "identity",
            local_geometric=local_geometric if not relu or local_geometric == "identity" else "permutation",
            memoryorder=memoryorder, blocksize=blocksize, tileshape=tileshape,
            alpha=alpha, beta=beta, gamma=gamma,
            hierarchical_blockshape=hierarchical_blockshape,
            hierarchical_permute_at_level=hierarchical_permute_at_level,
            rng=rng)

    def f_layergen(module, inshape_, outshape_, A, Ainv, params=None):
        return layergen(module, inshape_, outshape_, A, Ainv, params=params,
                        tileshape=tileshape, backend=backend, rng=mask_rng,
                        mask_alpha=alpha)

    sensor = KeyedSensor(inshape, f_keypair("input", inshape))
    model = KeyedModel(net, inshape, sensor.key(), f_keypair, f_layergen,
                       do_output_encryption=do_output_encryption) if net is not None else None
    return sensor, model


def IdentityKeynet(inshape, net, backend="jax", seed=None):
    return Keynet(inshape, net, backend=backend, seed=seed)


def PermutationKeynet(inshape, net, do_output_encryption=False, seed=None):
    return Keynet(inshape, net, global_geometric="permutation",
                  do_output_encryption=do_output_encryption, seed=seed)


def StochasticKeynet(inshape, net, alpha=2, blocksize=8, seed=None, **kwargs):
    """Doubly-stochastic local keys with hierarchical global permutation; the
    alpha privacy parameter sets nonzeros per key row (demo/vgg16.ipynb recipe)."""
    return Keynet(inshape, net, global_geometric="hierarchical_permutation",
                  hierarchical_blockshape=(2, 2), hierarchical_permute_at_level=(0, 1),
                  local_geometric="doubly_stochastic", alpha=alpha, blocksize=blocksize,
                  local_photometric="uniform_random_affine",
                  beta=kwargs.pop("beta", 1.0), gamma=kwargs.pop("gamma", 1.0),
                  seed=seed, **kwargs)


def TiledIdentityKeynet(inshape, net, tilesize, seed=None):
    return Keynet(inshape, net, tileshape=(tilesize, tilesize), seed=seed)


def TiledPermutationKeynet(inshape, net, tilesize, seed=None):
    return Keynet(inshape, net, local_geometric="permutation",
                  tileshape=(tilesize, tilesize), blocksize=tilesize, seed=seed)


def TiledOrthogonalKeynet(inshape, net, tilesize, hierarchical_permute_at_level=(0, 1), seed=None):
    return Keynet(inshape, net, tileshape=(tilesize, tilesize),
                  global_geometric="hierarchical_permutation",
                  hierarchical_blockshape=(2, 2),
                  hierarchical_permute_at_level=hierarchical_permute_at_level,
                  global_photometric="identity",
                  local_geometric="givens_orthogonal", alpha=tilesize, blocksize=tilesize,
                  local_photometric="uniform_random_affine", beta=0.1, gamma=100.0,
                  memoryorder="block", seed=seed)


def OpticalFiberBundleKeynet(inshape, net, seed=None, **keygen_kwargs):
    """Fiber-bundle sensor + keyed model (working version of the reference's
    broken factory at keynet/system.py:512-516)."""
    rng = np.random.default_rng(seed)
    mask_rng = np.random.default_rng(
        np.random.SeedSequence(entropy=seed, spawn_key=(1,)) if seed is not None
        else None)
    f_keypair = lambda layername, shape: keygen(shape, rng=rng, **keygen_kwargs)
    f_layergen = lambda module, ins, outs, A, Ainv, params=None: \
        layergen(module, ins, outs, A, Ainv, params=params, rng=mask_rng)
    sensor = OpticalFiberBundle(inshape, f_keypair("input", inshape))
    model = KeyedModel(net, inshape, sensor.key(), f_keypair, f_layergen) \
        if net is not None else None
    return sensor, model
