"""Quickstart demo (reference demo/lenet.ipynb): build a PermutationKeynet on
LeNet_AvgPool, encrypt an image, run keyed inference, inspect per-layer nnz,
and show the cross-keynet rejection property.

    PYTHONPATH=. python examples/lenet_demo.py [imagefile]
"""

import sys
import numpy as np

import keynet_tpu as keynet
from keynet_tpu.profiling import Stopwatch, print_layer_report

CHECKPOINT = "/root/reference/models/mnist_lenet_avgpool.pth"
IMAGE = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/demo/owl.jpg"


def main():
    net = keynet.models.LeNet_AvgPool()
    try:
        net.load_torch_state_dict(CHECKPOINT)
    except Exception:
        print("(checkpoint unavailable; random weights)")

    with Stopwatch() as sw:
        sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=42)
    print("keygen + conversion: %.2fs" % sw.elapsed)
    print_layer_report(knet)

    cipher = sensor.load(IMAGE).encrypt().tensor()
    print("\ncipher shape:", tuple(np.asarray(cipher).shape))
    y_keyed = np.asarray(knet.forward(cipher)).ravel()
    y_source = np.asarray(net.forward(sensor.decrypt().tensor())).ravel()
    print("keyed logits :", y_keyed.round(3))
    print("source logits:", y_source.round(3))
    print("max |keyed - source| = %.3g" % np.abs(y_keyed - y_source).max())

    # an image encrypted for THIS keynet is garbage through another keynet
    sensor.encrypt()
    other_sensor, other_knet = keynet.PermutationKeynet((1, 28, 28), net, seed=7)
    y_cross = np.asarray(other_knet.forward(sensor.tensor())).ravel()
    print("cross-keynet max deviation = %.3g (should be large)"
          % np.abs(y_cross - y_source).max())


if __name__ == "__main__":
    main()
