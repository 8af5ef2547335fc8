"""Golden-model parity: our flax DRN-D-22 trunk vs an independently-built
torch mirror, weights transferred through the import shim (SURVEY.md
section 4 'golden-model' + section 5 torch import).

The torch mirror below is constructed from the DRN paper description to match
our architecture spec (it is NOT reference code); agreement of the full
forward pass validates conv strides/dilations/padding and BN semantics, and
exercises import_torch_state_dict on a real trunk.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from mcseg_tpu.core.config import ModelConfig
from mcseg_tpu.models.factory import get_models, init_models
from mcseg_tpu.utils.torch_import import import_torch_state_dict


class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1, dilation=(1, 1)):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, padding=dilation[0],
                                dilation=dilation[0], bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, padding=dilation[1],
                                dilation=dilation[1], bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.proj = None
        if stride != 1 or cin != cout:
            self.proj = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idn = self.proj(x) if self.proj else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


def _conv_stage(cin, cout, n, stride=1, dilation=1):
    layers = []
    for i in range(n):
        layers += [
            tnn.Conv2d(cin if i == 0 else cout, cout, 3,
                       stride if i == 0 else 1, padding=dilation,
                       dilation=dilation, bias=False),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(inplace=True),
        ]
    return tnn.Sequential(*layers)


class TorchDRND22(tnn.Module):
    """arch D, layers (1,1,2,2,2,2,1,1), channels (16,...,512)."""

    def __init__(self, input_ch=3):
        super().__init__()
        ch = (16, 32, 64, 128, 256, 512, 512, 512)
        self.stem = tnn.Sequential(
            tnn.Conv2d(input_ch, ch[0], 7, 1, padding=3, bias=False),
            tnn.BatchNorm2d(ch[0]), tnn.ReLU(inplace=True),
        )
        self.layer1 = _conv_stage(ch[0], ch[0], 1, 1)
        self.layer2 = _conv_stage(ch[0], ch[1], 1, 2)
        self.layer3 = tnn.Sequential(
            TBasicBlock(ch[1], ch[2], 2), TBasicBlock(ch[2], ch[2])
        )
        self.layer4 = tnn.Sequential(
            TBasicBlock(ch[2], ch[3], 2), TBasicBlock(ch[3], ch[3])
        )
        self.layer5 = tnn.Sequential(
            TBasicBlock(ch[3], ch[4], 1, (2, 2)), TBasicBlock(ch[4], ch[4], 1, (2, 2))
        )
        self.layer6 = tnn.Sequential(
            TBasicBlock(ch[4], ch[5], 1, (4, 4)), TBasicBlock(ch[5], ch[5], 1, (4, 4))
        )
        self.layer7 = _conv_stage(ch[5], ch[6], 1, 1, dilation=2)
        self.layer8 = _conv_stage(ch[6], ch[7], 1, 1, dilation=1)

    def forward(self, x):
        x = self.stem(x)
        for i in range(1, 9):
            x = getattr(self, f"layer{i}")(x)
        return x


def test_drn_d_22_forward_matches_torch_mirror():
    torch.manual_seed(0)
    tm = TorchDRND22()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)
                m.weight.copy_(torch.rand_like(m.weight) * 0.5 + 0.75)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)

    cfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=4, dtype="float32")
    variables = init_models(cfg, jax.random.key(0), img_shape=(16, 16))
    params, stats = import_torch_state_dict(
        tm.state_dict(), variables["params"]["G"], variables["batch_stats"]["G"]
    )

    g, _, _ = get_models(cfg)
    x = np.random.RandomState(0).rand(1, 32, 48, 3).astype(np.float32)
    ours = g.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    theirs = (
        tm.eval()(torch.from_numpy(x).permute(0, 3, 1, 2))
        .detach().numpy().transpose(0, 2, 3, 1)
    )
    assert ours.shape == theirs.shape == (1, 4, 6, 512)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-3)


class TBottleneck(tnn.Module):
    """Torch mirror of the DRN Bottleneck (1x1 -> 3x3 dilated -> 1x1 x4)."""

    def __init__(self, cin, planes, stride=1, dilation=(1, 1)):
        super().__init__()
        cout = planes * 4
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride,
                                padding=dilation[1], dilation=dilation[1],
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.proj = None
        if stride != 1 or cin != cout:
            self.proj = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idn = self.proj(x) if self.proj else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idn)


class TorchDRND54(tnn.Module):
    """arch D, Bottleneck, layers (1,1,3,4,6,3,1,1) — mirrors drn_d_54."""

    def __init__(self, input_ch=3):
        super().__init__()
        ch = (16, 32, 64, 128, 256, 512, 512, 512)
        self.stem = tnn.Sequential(
            tnn.Conv2d(input_ch, ch[0], 7, 1, padding=3, bias=False),
            tnn.BatchNorm2d(ch[0]), tnn.ReLU(inplace=True),
        )
        self.layer1 = _conv_stage(ch[0], ch[0], 1, 1)
        self.layer2 = _conv_stage(ch[0], ch[1], 1, 2)

        def stage(cin, planes, n, stride=1, dilation=1):
            blocks = [TBottleneck(cin, planes, stride, (dilation, dilation))]
            for _ in range(1, n):
                blocks.append(TBottleneck(planes * 4, planes, 1,
                                          (dilation, dilation)))
            return tnn.Sequential(*blocks)

        self.layer3 = stage(ch[1], ch[2], 3, stride=2)
        self.layer4 = stage(ch[2] * 4, ch[3], 4, stride=2)
        self.layer5 = stage(ch[3] * 4, ch[4], 6, dilation=2)
        self.layer6 = stage(ch[4] * 4, ch[5], 3, dilation=4)
        self.layer7 = _conv_stage(ch[5] * 4, ch[6], 1, 1, dilation=2)
        self.layer8 = _conv_stage(ch[6], ch[7], 1, 1, dilation=1)

    def forward(self, x):
        x = self.stem(x)
        for i in range(1, 9):
            x = getattr(self, f"layer{i}")(x)
        return x


@pytest.mark.slow
def test_drn_d_54_bottleneck_forward_matches_torch_mirror():
    """Golden parity for the Bottleneck family (drn_d_54/105): forward through
    the import shim matches the torch mirror, validating the 1x1-3x3-1x1
    structure, x4 expansion, projection skips and dilation placement."""
    torch.manual_seed(0)
    tm = TorchDRND54()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)
                m.weight.copy_(torch.rand_like(m.weight) * 0.5 + 0.75)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)

    cfg = ModelConfig(net="drn_d_54", input_ch=3, n_class=4, dtype="float32")
    variables = init_models(cfg, jax.random.key(0), img_shape=(16, 16))
    params, stats = import_torch_state_dict(
        tm.state_dict(), variables["params"]["G"], variables["batch_stats"]["G"]
    )

    from mcseg_tpu.models.factory import get_models

    g, _, _ = get_models(cfg)
    x = np.random.RandomState(0).rand(1, 32, 48, 3).astype(np.float32)
    ours = g.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    theirs = (
        tm.eval()(torch.from_numpy(x).permute(0, 3, 1, 2))
        .detach().numpy().transpose(0, 2, 3, 1)
    )
    assert ours.shape == theirs.shape == (1, 4, 6, 512)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-3)


class TNoResBlock(tnn.Module):
    """Residual-free BasicBlock (DRN arch-C degridding levels 7-8)."""

    def __init__(self, cin, cout, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, padding=dilation,
                                dilation=dilation, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, padding=dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        return torch.relu(self.bn2(self.conv2(y)))


class TorchDRNC26(tnn.Module):
    """arch C, BasicBlock, layers (1,1,2,2,2,2,1,1) — mirrors drn_c_26:
    residual levels 1-2, residual-free degridding levels 7-8."""

    def __init__(self, input_ch=3):
        super().__init__()
        ch = (16, 32, 64, 128, 256, 512, 512, 512)
        self.stem = tnn.Sequential(
            tnn.Conv2d(input_ch, ch[0], 7, 1, padding=3, bias=False),
            tnn.BatchNorm2d(ch[0]), tnn.ReLU(inplace=True),
        )
        self.layer1 = tnn.Sequential(TBasicBlock(ch[0], ch[0], 1))
        self.layer2 = tnn.Sequential(TBasicBlock(ch[0], ch[1], 2))
        self.layer3 = tnn.Sequential(
            TBasicBlock(ch[1], ch[2], 2), TBasicBlock(ch[2], ch[2]))
        self.layer4 = tnn.Sequential(
            TBasicBlock(ch[2], ch[3], 2), TBasicBlock(ch[3], ch[3]))
        self.layer5 = tnn.Sequential(
            TBasicBlock(ch[3], ch[4], 1, (2, 2)),
            TBasicBlock(ch[4], ch[4], 1, (2, 2)))
        self.layer6 = tnn.Sequential(
            TBasicBlock(ch[4], ch[5], 1, (4, 4)),
            TBasicBlock(ch[5], ch[5], 1, (4, 4)))
        self.layer7 = tnn.Sequential(TNoResBlock(ch[5], ch[6], 2))
        self.layer8 = tnn.Sequential(TNoResBlock(ch[6], ch[7], 1))

    def forward(self, x):
        x = self.stem(x)
        for i in range(1, 9):
            x = getattr(self, f"layer{i}")(x)
        return x


def test_drn_c_26_forward_matches_torch_mirror():
    """Golden parity for the arch-C family (drn_c_26/42): residual levels
    1-2 and residual-free degridding levels validated through the import
    shim against a torch mirror."""
    torch.manual_seed(0)
    tm = TorchDRNC26()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)
                m.weight.copy_(torch.rand_like(m.weight) * 0.5 + 0.75)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)

    cfg = ModelConfig(net="drn_c_26", input_ch=3, n_class=4, dtype="float32")
    variables = init_models(cfg, jax.random.key(0), img_shape=(16, 16))
    params, stats = import_torch_state_dict(
        tm.state_dict(), variables["params"]["G"], variables["batch_stats"]["G"]
    )

    g, _, _ = get_models(cfg)
    x = np.random.RandomState(0).rand(1, 32, 48, 3).astype(np.float32)
    ours = g.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    theirs = (
        tm.eval()(torch.from_numpy(x).permute(0, 3, 1, 2))
        .detach().numpy().transpose(0, 2, 3, 1)
    )
    assert ours.shape == theirs.shape == (1, 4, 6, 512)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-3)


class TorchVGG16Trunk(tnn.Module):
    """Torch mirror of VGG16FeatureGenerator: 5 conv stages + FCN conv6/7."""

    def __init__(self, input_ch=3):
        super().__init__()
        stages = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))
        layers = []
        cin = input_ch
        for n_convs, ch in stages:
            for _ in range(n_convs):
                layers += [tnn.Conv2d(cin, ch, 3, padding=1), tnn.ReLU(True)]
                cin = ch
            layers.append(tnn.MaxPool2d(2, 2))
        self.features = tnn.Sequential(*layers)
        self.conv6 = tnn.Conv2d(512, 4096, 7, padding=3)
        self.conv7 = tnn.Conv2d(4096, 4096, 1)
        # indices of the pool outputs for stages 3 and 4
        self._p3_end = 2 * 2 + 1 + 2 * 2 + 1 + 3 * 2 + 1  # through pool3
        self._p4_end = self._p3_end + 3 * 2 + 1

    def forward(self, x):
        p3 = self.features[: self._p3_end](x)
        p4 = self.features[self._p3_end: self._p4_end](p3)
        p5 = self.features[self._p4_end:](p4)
        y = torch.relu(self.conv6(p5))
        y = torch.relu(self.conv7(y))
        return p3, p4, y


@pytest.mark.slow
def test_vgg16_trunk_forward_matches_torch_mirror():
    """Golden parity for the FCN8s-VGG16 generator: all three skip features
    (pool3 /8, pool4 /16, conv7 /32) match a torch mirror through the import
    shim (conv biases included; dropout off in eval)."""
    torch.manual_seed(0)
    tm = TorchVGG16Trunk()
    with torch.no_grad():
        for p in tm.parameters():
            p.mul_(0.2)  # tame the un-normalized VGG stack's activations

    from mcseg_tpu.models.factory import get_models

    cfg = ModelConfig(net="fcn8s_vgg16", input_ch=3, n_class=4, dtype="float32")
    variables = init_models(cfg, jax.random.key(0), img_shape=(32, 32))
    params, stats = import_torch_state_dict(
        tm.state_dict(), variables["params"]["G"], variables["batch_stats"]["G"]
    )
    g, _, _ = get_models(cfg)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    ours = g.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    theirs = tm.eval()(torch.from_numpy(x).permute(0, 3, 1, 2))
    for o, t, stride in zip(ours, theirs, (8, 16, 32)):
        tt = t.detach().numpy().transpose(0, 2, 3, 1)
        assert o.shape == tt.shape == (1, 64 // stride, 64 // stride, tt.shape[-1])
        np.testing.assert_allclose(np.asarray(o), tt, rtol=1e-4, atol=1e-5)
