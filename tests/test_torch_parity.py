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


class TMILNet(nn.Module):
    """Full reference-MILNet oracle: encoder + 4 heads + U-Net decoder
    (reference: model/resnet.py:121-164 constructor, :250-303 forward).
    Decoder sizes are passed in (the reference hard-codes 19/38/75/150/299
    for 299-square inputs; our decoder derives them from the skip shapes)."""

    def __init__(self, block, stages):
        super().__init__()
        self.resnet = TResNet(block, stages)
        e = block.expansion
        c = 512 * e
        self.fc_tile = nn.Sequential(nn.Flatten(), nn.Linear(c, 2))

        def image_head(out, relu_out):
            layers = [
                nn.Flatten(), nn.BatchNorm1d(c), nn.Dropout(0.25),
                nn.ReLU(), nn.Linear(c, 64), nn.BatchNorm1d(64),
                nn.Dropout(), nn.Linear(64, out),
            ]
            if relu_out:
                layers.append(nn.ReLU())
            return nn.Sequential(*layers)

        self.fc_image_cls = image_head(7, False)
        self.fc_image_reg = image_head(1, True)

        def up(cin, cout):
            return nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
                nn.ReLU(),
            )

        up7 = 64 if e == 1 else 32 * e
        self.upconv1 = up(512 * e, 256 * e)
        self.upconv2 = up(512 * e, 256 * e)
        self.upconv3 = up(256 * e, 128 * e)
        self.upconv4 = up(256 * e, 128 * e)
        self.upconv5 = up(128 * e, 64 * e)
        self.upconv6 = up(128 * e, 64 * e)
        self.upconv7 = up(64 * e, up7)
        self.upconv8 = up(up7, 64)
        self.seg_out_conv = nn.Conv2d(64, 2, 1)

    def forward_tile(self, x):
        x4, *_ = self.resnet(x)
        pooled = torch.nn.functional.adaptive_avg_pool2d(x4, 1) + \
            torch.nn.functional.adaptive_max_pool2d(x4, 1)
        return self.fc_tile(pooled)

    def forward_image(self, x):
        x4, *_ = self.resnet(x)
        pooled = torch.nn.functional.adaptive_avg_pool2d(x4, 1) + \
            torch.nn.functional.adaptive_max_pool2d(x4, 1)
        return self.fc_image_cls(pooled), self.fc_image_reg(pooled)

    def forward_seg(self, x, sizes):
        import torch.nn.functional as F

        x4, x3, x2, x1 = self.resnet(x)
        s3, s2, s1, s_mid, s_out = sizes
        out = F.interpolate(x4, size=s3, mode="bilinear", align_corners=True)
        out = self.upconv1(out)
        out = self.upconv2(torch.cat([out, x3], dim=1))
        out = F.interpolate(out, size=s2, mode="bilinear", align_corners=True)
        out = self.upconv3(out)
        out = self.upconv4(torch.cat([out, x2], dim=1))
        out = F.interpolate(out, size=s1, mode="bilinear", align_corners=True)
        out = self.upconv5(out)
        out = self.upconv6(torch.cat([out, x1], dim=1))
        out = F.interpolate(out, size=s_mid, mode="bilinear", align_corners=True)
        out = self.upconv8(self.upconv7(out))
        out = F.interpolate(out, size=s_out, mode="bilinear", align_corners=True)
        return self.seg_out_conv(out)


def _randomize(model: nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        # fan-in-scaled std keeps activations O(1) through the deep decoder
        # so relative tolerances stay meaningful (fixed std makes the e=4
        # decoder amplify ~3x per layer and drowns parity in FP noise)
        if isinstance(m, nn.Conv2d):
            fan = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
            nn.init.normal_(m.weight, std=0.7 / fan ** 0.5, generator=g)
            if m.bias is not None:
                nn.init.uniform_(m.bias, -0.1, 0.1, generator=g)
        elif isinstance(m, nn.Linear):
            nn.init.normal_(m.weight, std=0.7 / m.in_features ** 0.5, generator=g)
            nn.init.uniform_(m.bias, -0.1, 0.1, generator=g)
        elif isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
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


@pytest.mark.parametrize(
    "arch,block,stages,bottleneck,hw",
    [
        # 299² = the reference's exact hard-coded decoder ladder
        # 19/38/75/150/299 (reference: model/resnet.py:280-303)
        ("resnet18", TBasic, (2, 2, 2, 2), False, 299),
        # non-299 input exercises our derived-from-skip-shapes sizes with
        # the expansion-4 decoder (reference: MILresnet50 expansion=4, :357)
        ("resnet50", TBottleneck, (3, 4, 6, 3), True, 75),
    ],
)
def test_full_model_matches_torch_oracle(arch, block, stages, bottleneck, hw):
    """Composed image/tile/segment forwards vs the torch MILNet oracle —
    the in-env proxy for the ≥0.99-IoU mask-parity gate (BASELINE.md)."""
    from cellsegmentation_tpu.utils.torch_convert import convert_milnet

    tmodel = TMILNet(block, stages)
    _randomize(tmodel, seed=1)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    # strip the oracle's encoder prefix to the reference's flat schema
    sd = {k.removeprefix("resnet."): v for k, v in sd.items()}
    params, stats = convert_milnet(sd, stages, bottleneck)

    model = build_model(arch, policy=F32_POLICY)
    variables = {"params": params, "batch_stats": stats}
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, hw, hw, 3)).astype(np.float32) * 0.5
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    fwd = jax.jit(
        lambda v, xx, mode: model.apply(v, xx, mode=mode, train=False),
        static_argnames="mode",
    )

    with torch.no_grad():
        t_cls, t_reg = tmodel.forward_image(xt)
        t_tile = tmodel.forward_tile(xt)

        def down(s):  # k3 p1 s2 (== the stem's k7 p3 s2): (s-1)//2 + 1
            return (s - 1) // 2 + 1

        x1hw = down(down(hw))  # stem conv + maxpool
        x2hw, x3hw = down(x1hw), down(down(x1hw))
        # decoder ladder: x3, x2, x1, 2*x1, hw — equals the reference's
        # hard-coded 19/38/75/150/299 at hw=299
        t_seg = tmodel.forward_seg(xt, (x3hw, x2hw, x1hw, 2 * x1hw, hw))

    o_cls, o_reg = fwd(variables, jnp.asarray(x), "image")
    np.testing.assert_allclose(
        np.asarray(o_cls), t_cls.numpy(), rtol=2e-3, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(o_reg), t_reg.numpy(), rtol=2e-3, atol=2e-2
    )

    o_tile = fwd(variables, jnp.asarray(x), "tile")
    np.testing.assert_allclose(
        np.asarray(o_tile), t_tile.numpy(), rtol=2e-3, atol=2e-2
    )

    o_seg = fwd(variables, jnp.asarray(x), "segment")
    want = np.transpose(t_seg.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(o_seg), want, rtol=2e-3, atol=3e-2)
    # the deliverable metric: thresholded-mask IoU vs torch must clear the
    # BASELINE ≥0.99 gate
    ours_mask = np.asarray(o_seg).argmax(-1)
    torch_mask = want.argmax(-1)
    inter = np.logical_and(ours_mask, torch_mask).sum()
    union = np.logical_or(ours_mask, torch_mask).sum()
    iou = inter / union if union else 1.0
    assert iou >= 0.99, f"mask IoU vs torch {iou:.4f} < 0.99"
