"""Dilated Residual Networks (DRN) — TPU-native Flax implementation.

The reference vendors fyu/drn as ``models/drn.py`` (SURVEY.md section 2) and
uses it as the shared feature generator G with output stride 8. This is a
from-scratch NHWC Flax implementation of the architectures described in
*Dilated Residual Networks* (Yu, Koltun, Funkhouser, CVPR 2017,
arXiv:1705.09914):

  * levels 1-2: plain conv stages (arch D) or residual stages (arch C)
  * levels 3-4: residual blocks with stride 2
  * levels 5-6: stride replaced by dilation 2 / 4  ->  output stride stays 8
  * levels 7-8: degridding stages with decreasing dilation (2, then 1),
    non-residual (both archs; arch C uses residual-free BasicBlocks, arch D
    plain conv stages)

Variants and depths (paper Table 1 + fyu/drn model zoo, reconstructed [R]):
  drn_d_22 : BasicBlock [1,1,2,2,2,2,1,1]
  drn_d_38 : BasicBlock [1,1,3,4,6,3,1,1]   (the reference's default --net)
  drn_d_54 : Bottleneck [1,1,3,4,6,3,1,1]
  drn_d_105: Bottleneck [1,1,3,4,23,3,1,1]
  drn_c_26 : BasicBlock [1,1,2,2,2,2,1,1]
  drn_c_42 : BasicBlock [1,1,3,4,6,3,1,1]

TPU-first choices (NOT in the reference):
  * NHWC layout end-to-end — the native conv layout for XLA:TPU.
  * Activations/matmuls in bf16 (``dtype``), parameters + BatchNorm statistics
    in fp32 — MXU-friendly without numerics drift.
  * All shapes static; the whole trunk is one XLA fusion region under jit.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any

# BatchNorm semantics matched to the reference's torch defaults:
# torch BatchNorm2d(momentum=0.1, eps=1e-5)  ==  flax BatchNorm(momentum=0.9).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def _conv(
    features: int,
    kernel: int,
    stride: int = 1,
    dilation: int = 1,
    name: str | None = None,
    dtype=jnp.float32,
) -> nn.Conv:
    """3x3/7x7/1x1 conv, no bias (BN follows).

    Padding is explicit symmetric ``dilation * (k // 2)`` — torch's
    ``padding=dilation`` convention — NOT 'SAME': for stride-2 convs on even
    sizes SAME pads asymmetrically (0,1) while torch pads (1,1), which would
    shift every downsampled feature map by one pixel and break
    torch-checkpoint import parity (utils/torch_import.py).
    """
    pad = dilation * (kernel // 2)
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        kernel_dilation=(dilation, dilation),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        # DRN init convention: N(0, sqrt(2 / (k*k*out_ch))) — Kaiming-normal
        # with fan_out (he init as used by the ResNet/DRN family) rather than
        # flax's lecun_normal, for from-scratch convergence parity.
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name,
    )


def _bn(train: bool, name: str | None = None, dtype=jnp.float32) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class ConvStage(nn.Module):
    """Non-residual conv stage: n x (conv3x3 -> BN -> ReLU).

    Used for levels 1-2 and the degridding levels 7-8 of arch D.
    """

    features: int
    n_layers: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_layers):
            s = self.stride if i == 0 else 1
            x = _conv(self.features, 3, s, self.dilation, dtype=self.dtype, name=f"conv{i}")(x)
            x = _bn(train, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """Two 3x3 convs with a (possibly distinct) dilation each + identity skip."""

    expansion = 1

    features: int
    stride: int = 1
    dilation: Tuple[int, int] = (1, 1)
    residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_proj = self.stride != 1 or x.shape[-1] != self.features
        identity = x
        y = _conv(self.features, 3, self.stride, self.dilation[0], dtype=self.dtype, name="conv1")(x)
        y = _bn(train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, self.dilation[1], dtype=self.dtype, name="conv2")(y)
        y = _bn(train, dtype=self.dtype, name="bn2")(y)
        if self.residual:
            if needs_proj:
                identity = _conv(self.features, 1, self.stride, dtype=self.dtype, name="proj_conv")(x)
                identity = _bn(train, dtype=self.dtype, name="proj_bn")(identity)
            y = y + identity
        return nn.relu(y)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(dilated) -> 1x1(x4) with identity skip."""

    expansion = 4

    features: int  # bottleneck width; output is features * 4
    stride: int = 1
    dilation: Tuple[int, int] = (1, 1)
    residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_features = self.features * self.expansion
        needs_proj = self.stride != 1 or x.shape[-1] != out_features
        identity = x
        y = _conv(self.features, 1, dtype=self.dtype, name="conv1")(x)
        y = _bn(train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, self.stride, self.dilation[1], dtype=self.dtype, name="conv2")(y)
        y = _bn(train, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = _conv(out_features, 1, dtype=self.dtype, name="conv3")(y)
        y = _bn(train, dtype=self.dtype, name="bn3")(y)
        if self.residual:
            if needs_proj:
                identity = _conv(out_features, 1, self.stride, dtype=self.dtype, name="proj_conv")(x)
                identity = _bn(train, dtype=self.dtype, name="proj_bn")(identity)
            y = y + identity
        return nn.relu(y)


class ResStage(nn.Module):
    """A level of residual blocks.

    Dilation rule (DRN paper section 4): when a level first enters a dilation
    regime via ``new_level=True``, the first conv of the first block uses half
    the level's dilation to ramp up smoothly; levels 5-6 use
    ``new_level=False`` (full dilation from the first block).
    """

    block: ModuleDef
    features: int
    n_blocks: int
    stride: int = 1
    dilation: int = 1
    new_level: bool = True
    residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dilation == 1:
            first_dil = (1, 1)
        else:
            first_dil = (
                self.dilation // 2 if self.new_level else self.dilation,
                self.dilation,
            )
        x = self.block(
            features=self.features,
            stride=self.stride,
            dilation=first_dil,
            residual=self.residual,
            dtype=self.dtype,
            name="block0",
        )(x, train)
        for i in range(1, self.n_blocks):
            x = self.block(
                features=self.features,
                dilation=(self.dilation, self.dilation),
                residual=self.residual,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train)
        return x


class DRN(nn.Module):
    """Dilated Residual Network trunk, output stride 8.

    Input : NHWC float, ``input_ch`` channels (1/3/4/6 — the multichannel
            widening of the reference's ``model_util.get_models``).
    Output: NHWC feature map [B, H/8, W/8, out_dim].
    """

    arch: str  # 'C' | 'D'
    block: ModuleDef
    layers: Sequence[int]
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512, 512, 512)
    input_ch: int = 3
    dtype: Any = jnp.float32
    # Space-to-depth execution of levels 0-2 (ops/s2d.py): exact rearrangement,
    # identical parameter tree — avoids XLA:TPU's padded batch-minor layouts
    # for sub-32-channel convs (~65% of MCD step time at 640x480 on v5e).
    s2d: bool = False

    @property
    def out_dim(self) -> int:
        return self.channels[-1]

    def _use_s2d(self, x) -> bool:
        # arch C runs ResStages at levels 1-2; the packed twin exists only
        # for BasicBlock (arch D's ConvStage levels are block-agnostic).
        packable = self.arch == "D" or self.block is BasicBlock
        return (
            self.s2d and packable
            and x.shape[1] % 2 == 0 and x.shape[2] % 4 == 0
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mcseg_tpu.ops import s2d as _s2d  # local import: avoid cycle

        ch, L = self.channels, self.layers
        x = x.astype(self.dtype)
        if self._use_s2d(x):
            # packed domain: pack (2,4) -> 128ch at conv0/layer1, (1,2) ->
            # 64ch out of layer2; same math, same variables (ops/s2d.py).
            xp = _s2d.space_to_depth(x, 2, 4)
            xp = _s2d.PackedConv(
                ch[0], 7, 1, in_pack=(2, 4), out_pack=(2, 4),
                dtype=self.dtype, name="conv0")(xp)
            xp = _s2d.PackedBatchNorm(
                groups=8, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                dtype=self.dtype, name="bn0")(xp, train)
            xp = nn.relu(xp)
            stage = _s2d.PackedResStage if self.arch == "C" else _s2d.PackedConvStage
            kw1 = {"n_blocks": L[0]} if self.arch == "C" else {"n_layers": L[0]}
            kw2 = {"n_blocks": L[1]} if self.arch == "C" else {"n_layers": L[1]}
            bn_kw = {"momentum": BN_MOMENTUM, "epsilon": BN_EPS}
            xp = stage(
                ch[0], stride=1, in_pack=(2, 4), out_pack=(2, 4),
                dtype=self.dtype, name="layer1", **bn_kw, **kw1)(xp, train)
            # Level 3 runs packed too when its block is a BasicBlock (all
            # drn_d_22/38 and arch-C variants): round-2 profiling showed the
            # unpacked 64-channel layer3 convs at ~28% MXU (64-deep
            # contraction uses half the 128-wide array) — ~100 ms/step of
            # the 640x480 MCD step including the unpack-boundary copies.
            # Packs: layer2 out (2,2) -> 128ch, layer3 out (1,2) -> 128ch,
            # unpack after. Round 1's attempt carried (1,2) (64ch) through
            # layer3 and lost; the (2,2) geometry keeps the contraction
            # 128-deep. Bottleneck trunks (d_54/105) keep the old boundary.
            pack3 = self.block is BasicBlock
            xp = stage(
                ch[1], stride=2, in_pack=(2, 4),
                out_pack=(2, 2) if pack3 else (1, 2),
                dtype=self.dtype, name="layer2", **bn_kw, **kw2)(xp, train)
            if pack3:
                xp = _s2d.PackedResStage(
                    ch[2], n_blocks=L[2], stride=2, in_pack=(2, 2),
                    out_pack=(1, 2), dtype=self.dtype, name="layer3",
                    **bn_kw)(xp, train)
            x = _s2d.depth_to_space(xp, 1, 2)
            layer3_done = pack3
        else:
            # level 0: 7x7 stem
            x = _conv(ch[0], 7, 1, dtype=self.dtype, name="conv0")(x)
            x = _bn(train, dtype=self.dtype, name="bn0")(x)
            x = nn.relu(x)
            # levels 1-2
            if self.arch == "C":
                x = ResStage(self.block, ch[0], L[0], stride=1, dtype=self.dtype, name="layer1")(x, train)
                x = ResStage(self.block, ch[1], L[1], stride=2, dtype=self.dtype, name="layer2")(x, train)
            else:  # arch D
                x = ConvStage(ch[0], L[0], stride=1, dtype=self.dtype, name="layer1")(x, train)
                x = ConvStage(ch[1], L[1], stride=2, dtype=self.dtype, name="layer2")(x, train)
            layer3_done = False
        # levels 3-4: strided residual (both paths)
        if not layer3_done:
            x = ResStage(self.block, ch[2], L[2], stride=2, dtype=self.dtype, name="layer3")(x, train)
        x = ResStage(self.block, ch[3], L[3], stride=2, dtype=self.dtype, name="layer4")(x, train)
        # levels 5-6: dilation instead of stride
        x = ResStage(self.block, ch[4], L[4], dilation=2, new_level=False, dtype=self.dtype, name="layer5")(x, train)
        x = ResStage(self.block, ch[5], L[5], dilation=4, new_level=False, dtype=self.dtype, name="layer6")(x, train)
        # levels 7-8: degridding
        if self.arch == "C":
            x = ResStage(
                BasicBlock, ch[6], L[6], dilation=2, new_level=False,
                residual=False, dtype=self.dtype, name="layer7",
            )(x, train)
            x = ResStage(
                BasicBlock, ch[7], L[7], dilation=1, new_level=False,
                residual=False, dtype=self.dtype, name="layer8",
            )(x, train)
        else:
            x = ConvStage(ch[6], L[6], dilation=2, dtype=self.dtype, name="layer7")(x, train)
            x = ConvStage(ch[7], L[7], dilation=1, dtype=self.dtype, name="layer8")(x, train)
        return x


_DRN_ZOO = {
    # drn_d_14 is NOT a published DRN variant: a framework-internal minimal
    # trunk (one block per residual level) exercising the exact same stage
    # structure/padding/dilation schedule at ~half the graph size — used by
    # the multichip dryrun's secondary families and tests to bound cold
    # XLA compile time (VERDICT r4 #1). Production nets are d_22 and up.
    "drn_d_14": dict(arch="D", block=BasicBlock, layers=(1, 1, 1, 1, 1, 1, 1, 1)),
    "drn_d_22": dict(arch="D", block=BasicBlock, layers=(1, 1, 2, 2, 2, 2, 1, 1)),
    "drn_d_38": dict(arch="D", block=BasicBlock, layers=(1, 1, 3, 4, 6, 3, 1, 1)),
    "drn_d_54": dict(arch="D", block=Bottleneck, layers=(1, 1, 3, 4, 6, 3, 1, 1)),
    "drn_d_105": dict(arch="D", block=Bottleneck, layers=(1, 1, 3, 4, 23, 3, 1, 1)),
    "drn_c_26": dict(arch="C", block=BasicBlock, layers=(1, 1, 2, 2, 2, 2, 1, 1)),
    "drn_c_42": dict(arch="C", block=BasicBlock, layers=(1, 1, 3, 4, 6, 3, 1, 1)),
}


def drn_variants() -> Tuple[str, ...]:
    return tuple(_DRN_ZOO)


def build_drn(net: str, input_ch: int = 3, dtype=jnp.float32, s2d: str = "auto") -> DRN:
    if net not in _DRN_ZOO:
        raise ValueError(f"unknown DRN variant {net!r}; options: {sorted(_DRN_ZOO)}")
    spec = _DRN_ZOO[net]
    from mcseg_tpu.ops.s2d import resolve_s2d  # local import: avoid cycle

    use_s2d = resolve_s2d(s2d)
    return DRN(
        arch=spec["arch"],
        block=spec["block"],
        layers=spec["layers"],
        input_ch=input_ch,
        dtype=dtype,
        s2d=use_s2d,
    )
