"""Generate torch-oracle activations for parity tests.

Runs the reference architectures in torch (CPU) on fixed random inputs using
the checkpoints shipped with the reference repo, and stores inputs/outputs as
an npz fixture.  Torch is the independent oracle; the test suite compares the
keynet_tpu JAX forwards and keyed forwards against these numbers.
"""
import numpy as np, torch, torch.nn as nn

SD = '/root/reference/models/mnist_lenet_avgpool.pth'
SD_MAX = '/root/reference/models/mnist_lenet.pth'

class LeNetAvg(nn.Module):
    def __init__(s):
        super().__init__()
        s.conv1 = nn.Conv2d(1,6,3,1,1); s.pool1=nn.AvgPool2d(3,2,1)
        s.conv2 = nn.Conv2d(6,16,3,1,1); s.pool2=nn.AvgPool2d(3,2,1)
        s.fc1=nn.Linear(784,120); s.fc2=nn.Linear(120,84); s.fc3=nn.Linear(84,10)
    def forward(s,x):
        r=torch.relu
        x=s.pool1(r(s.conv1(x))); x=s.pool2(r(s.conv2(x)))
        x=x.view(-1,784); return s.fc3(r(s.fc2(r(s.fc1(x)))))

class LeNetMax(LeNetAvg):
    def __init__(s):
        super().__init__()
        s.pool1=nn.MaxPool2d(3,2,1); s.pool2=nn.MaxPool2d(3,2,1)

rng = np.random.default_rng(42)
x = rng.normal(size=(4,1,28,28)).astype(np.float32)

out = {'x': x}
for key, cls, sd in [('avg', LeNetAvg, SD), ('max', LeNetMax, SD_MAX)]:
    net = cls(); net.load_state_dict(torch.load(sd)); net.eval()
    with torch.no_grad():
        out['y_' + key] = net(torch.as_tensor(x)).numpy()
np.savez('/root/repo/tests/data/lenet_oracle.npz', **out)
print("wrote tests/data/lenet_oracle.npz", {k: v.shape for k, v in out.items()})
