"""Keynet parameter-count tables (reference demo/figures.py:236-293): nnz of
each named keynet configuration vs the source model, LeNet scale.

    PYTHONPATH=. python examples/param_tables.py [--allconv]
"""

import sys
import numpy as np

import keynet_tpu as keynet


def table(net, inshape, configs):
    print("source parameters: %d" % net.num_parameters())
    for name, fac, kwargs in configs:
        sensor, knet = fac(inshape, net, **kwargs)
        print("%-28s nnz=%-10d device=%6.1f MB"
              % (name, knet.num_parameters(), knet.device_bytes() / 1e6))


def main():
    if "--allconv" in sys.argv:
        net = keynet.models.AllConvNet(batchnorm=False, seed=0)
        inshape = (3, 32, 32)
        tile = 8
    else:
        net = keynet.models.LeNet_AvgPool(seed=0)
        inshape = (1, 28, 28)
        tile = 14
    table(net, inshape, [
        ("IdentityKeynet", keynet.IdentityKeynet, dict(seed=0)),
        ("PermutationKeynet", keynet.PermutationKeynet, dict(seed=0)),
        ("TiledIdentityKeynet-%d" % tile, keynet.TiledIdentityKeynet,
         dict(tilesize=tile, seed=0)),
        ("TiledPermutationKeynet-%d" % tile, keynet.TiledPermutationKeynet,
         dict(tilesize=tile, seed=0)),
        ("TiledOrthogonalKeynet-%d" % tile, keynet.TiledOrthogonalKeynet,
         dict(tilesize=tile, seed=0)),
        ("StochasticKeynet-a2", keynet.StochasticKeynet,
         dict(alpha=2, blocksize=tile, seed=0)),
    ])


if __name__ == "__main__":
    main()
