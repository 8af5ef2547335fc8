"""Golden-model parity for the PSPNet backbone (VERDICT r1 #8: PSPNet was
assertion-thin — forward-shape/step-runs only).

An independent torch mirror of the same spec (dilated ResNet-50 trunk,
output-stride 8, + Pyramid Pooling Module per Zhao et al. CVPR 2017) is built
below; weights transfer through the import shim and the full G forward must
match — validating stem/maxpool geometry, Bottleneck stage layout, the
dilation-2/4 stages, adaptive pooling, and the PPM fuse. The reference's
``--net psp`` presence is itself flagged [?] in SURVEY.md section 2; this
pins OUR implementation to the published architecture either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from mcseg_tpu.core.config import ModelConfig
from mcseg_tpu.models.factory import get_models, init_models
from mcseg_tpu.utils.torch_import import import_torch_state_dict
from tests.test_golden_drn import TBottleneck


class TorchPPM(tnn.Module):
    def __init__(self, cin=2048, reduce_ch=512, bins=(1, 2, 3, 6)):
        super().__init__()
        self.bins = bins
        per = reduce_ch // len(bins)
        # one Module per bin, in bin order (import matches definition order)
        self.reduces = tnn.ModuleList()
        for _ in bins:
            self.reduces.append(tnn.Sequential(
                tnn.Conv2d(cin, per, 1, bias=False), tnn.BatchNorm2d(per)))
        self.fuse = tnn.Conv2d(cin + reduce_ch, reduce_ch, 3, padding=1,
                               bias=False)
        self.fuse_bn = tnn.BatchNorm2d(reduce_ch)

    def forward(self, x):
        h, w = x.shape[2:]
        outs = [x]
        for n_bins, red in zip(self.bins, self.reduces):
            y = TF.adaptive_avg_pool2d(x, n_bins)
            y = torch.relu(red(y))
            y = TF.interpolate(y, (h, w), mode="bilinear", align_corners=False)
            outs.append(y)
        y = torch.cat(outs, dim=1)
        return torch.relu(self.fuse_bn(self.fuse(y)))


class TorchPSPTrunk(tnn.Module):
    """Mirror of PSPFeatureGenerator: conv7-s2 stem + maxpool(3,2,1) ->
    ResNet-50 stages (dilation 2/4 in stages 3-4, full dilation from the
    first block) -> PPM."""

    def __init__(self, input_ch=3):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv2d(input_ch, 64, 7, 2, padding=3, bias=False),
            tnn.BatchNorm2d(64), tnn.ReLU(inplace=True),
        )
        self.pool = tnn.MaxPool2d(3, 2, padding=1)

        def stage(cin, planes, n, stride=1, dilation=1):
            blocks = [TBottleneck(cin, planes, stride, (dilation, dilation))]
            for _ in range(1, n):
                blocks.append(TBottleneck(planes * 4, planes, 1,
                                          (dilation, dilation)))
            return tnn.Sequential(*blocks)

        self.layer1 = stage(64, 64, 3)
        self.layer2 = stage(256, 128, 4, stride=2)
        self.layer3 = stage(512, 256, 6, dilation=2)
        self.layer4 = stage(1024, 512, 3, dilation=4)
        self.ppm = TorchPPM()

    def forward(self, x):
        x = self.pool(self.stem(x))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return self.ppm(x)


@pytest.mark.slow
def test_psp_forward_matches_torch_mirror():
    torch.manual_seed(0)
    tm = TorchPSPTrunk()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)
                m.weight.copy_(torch.rand_like(m.weight) * 0.5 + 0.75)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)

    cfg = ModelConfig(net="psp", input_ch=3, n_class=4, dtype="float32")
    variables = init_models(cfg, jax.random.key(0), img_shape=(48, 48))
    params, stats = import_torch_state_dict(
        tm.state_dict(), variables["params"]["G"], variables["batch_stats"]["G"]
    )

    g, _, _ = get_models(cfg)
    # 48x48 -> /8 = 6x6 features: every PPM bin (1,2,3,6) divides exactly, so
    # adaptive pooling is the same arithmetic on both sides
    x = np.random.RandomState(0).rand(1, 48, 48, 3).astype(np.float32)
    ours = g.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    theirs = (
        tm.eval()(torch.from_numpy(x).permute(0, 3, 1, 2))
        .detach().numpy().transpose(0, 2, 3, 1)
    )
    assert ours.shape == theirs.shape == (1, 6, 6, 512)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-3)
