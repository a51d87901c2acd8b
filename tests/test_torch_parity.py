"""Numerical parity: a torch ResNet oracle vs our Flax encoder with
converted weights — the correctness proof for the torchvision-checkpoint
path (SURVEY §7 hard parts: pretrained weights needed for QWK ≥0.93).

torchvision isn't installed here, so the oracle is a minimal torch ResNet
written in this test with the torchvision state-dict key schema
(conv1/bn1/layerX.Y.convZ|bnZ|downsample.{0,1}) that the converter targets.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cellsegmentation_tpu.core.dtypes import F32_POLICY  # noqa: E402
from cellsegmentation_tpu.models import build_model  # noqa: E402
from cellsegmentation_tpu.utils.torch_convert import convert_resnet_encoder  # noqa: E402


class TBasic(nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + r)


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * 4
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + r)


class TResNet(nn.Module):
    def __init__(self, block, stages):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for s, (planes, blocks) in enumerate(zip((64, 128, 256, 512), stages)):
            layers = []
            for b in range(blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                layers.append(block(cin, planes, stride))
                cin = planes * block.expansion
            setattr(self, f"layer{s + 1}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        return x4, x3, x2, x1


def _randomize(model: nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            nn.init.normal_(m.weight, std=0.05, generator=g)
        elif isinstance(m, nn.BatchNorm2d):
            nn.init.uniform_(m.weight, 0.5, 1.5, generator=g)
            nn.init.uniform_(m.bias, -0.2, 0.2, generator=g)
            m.running_mean.normal_(0, 0.3, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


@pytest.mark.parametrize(
    "arch,block,stages,bottleneck",
    [
        ("resnet18", TBasic, (2, 2, 2, 2), False),
        ("resnet50", TBottleneck, (3, 4, 6, 3), True),
    ],
)
def test_encoder_matches_torch_oracle(arch, block, stages, bottleneck):
    tmodel = TResNet(block, stages)
    _randomize(tmodel, seed=0)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet_encoder(sd, stages, bottleneck)

    model = build_model(arch, policy=F32_POLICY)
    enc = model.encoder
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    fwd = jax.jit(lambda v, xx: enc.apply(v, xx, train=False))
    x4, x3, x2, x1 = fwd({"params": params, "batch_stats": stats}, jnp.asarray(x))

    with torch.no_grad():
        t4, t3, t2, t1 = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    for ours, theirs in [(x1, t1), (x2, t2), (x3, t3), (x4, t4)]:
        want = np.transpose(theirs.numpy(), (0, 2, 3, 1))
        # tolerances absorb conv-order FP divergence accumulated over ~50
        # layers (observed worst case: |Δ|≈5e-3 on O(1) activations)
        np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-3, atol=1e-2)
