"""Exact space-to-depth (s2d) transform for small-channel conv stages.

Why this exists (TPU roofline, measured on v5e): XLA:TPU lays out conv
operands with **batch minor** when the channel count is below ~32
(``bf16[N,H,W,16]{0,3,2,1:T(8,128)}``), padding N=24 to 128 lanes — a ~5.3x
physical-bytes blowup on every BatchNorm / weight-grad / elementwise
traversal of the full-resolution DRN stem tensors. That padding was ~65% of
the MCD step time at 640x480. From C>=32 XLA keeps channel-minor layouts and
these passes run at full HBM bandwidth.

The fix: run the early levels in a space-to-depth packed domain where
channels are >=64. This is NOT an architecture change — the packed
convolution uses a kernel **derived from the original weights** such that the
packed network computes bit-for-bit the same function (up to float reduction
order) as the unpacked one. Parameters, checkpoints, torch imports, and
golden tests are untouched; packing is applied inside jit at apply time.

Math. Pack factor p per spatial dim: packed tensor
``xp[n, P, c_pack]`` with ``c_pack = (a_h * p_w + a_w) * C + c`` holding
``x[n, p_h*P_h + a_h, p_w*P_w + a_w, c]``. For an original conv (kernel k,
stride s, symmetric zero pad) with input packed by ``pi`` and output packed
by ``po``, the packed conv has stride ``sp = s * po / pi`` (must divide
evenly) and its kernel entry at packed tap ``t``, input phase ``ai``, output
phase ``ao`` is the original weight at tap

    u = pi * (t - pp) + ai + pad - s * ao        (zero if u outside [0, k))

independently per spatial dim — a pure (sparse) rearrangement of the
original [kh, kw, ci, co] weights into [kph, kpw, pi*ci, po*co]. The
reference network (SURVEY.md section 2, DRN backbone row) is preserved
exactly; only the computation layout changes (same trick MLPerf ResNet uses
for TPU stems, generalized to stride-1 convs and asymmetric H/W packs).
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def resolve_s2d(s2d) -> bool:
    """Resolve a ModelConfig.s2d value ('auto'|'on'|'off'|bool) to a bool.

    'auto' = packed execution on TPU (where the sub-32-channel batch-minor
    layout problem exists), plain execution elsewhere. Shared by every trunk
    family with an s2d fast path (DRN, VGG-FCN8s).
    """
    if s2d == "auto":
        return jax.default_backend() == "tpu"
    if s2d in ("on", True):
        return True
    if s2d in ("off", False):
        return False
    # argparse `choices` only guards the CLI path; programmatic
    # ModelConfig(s2d='ON'/'yes'/...) must not silently lose the fast path.
    raise ValueError(f"s2d must be 'auto'|'on'|'off' or bool, got {s2d!r}")


def space_to_depth(x: jax.Array, ph: int, pw: int) -> jax.Array:
    """[N,H,W,C] -> [N,H/ph,W/pw,ph*pw*C]; channel order (a_h, a_w, c)."""
    n, h, w, c = x.shape
    if h % ph or w % pw:
        raise ValueError(f"spatial {h}x{w} not divisible by pack {ph}x{pw}")
    x = x.reshape(n, h // ph, ph, w // pw, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // ph, w // pw, ph * pw * c)


def depth_to_space(x: jax.Array, ph: int, pw: int) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    n, hp, wp, cp = x.shape
    c = cp // (ph * pw)
    x = x.reshape(n, hp, wp, ph, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hp * ph, wp * pw, c)


def _tap_map_1d(k: int, stride: int, pad: int, pi: int, po: int):
    """Per-dim packed-tap geometry.

    Returns (kp, pp, sp, entries) where entries is a list of
    (t, ai, ao, u) with u the original-kernel tap feeding packed tap t at
    input phase ai / output phase ao.
    """
    if (stride * po) % pi:
        raise ValueError(f"incompatible pack: stride={stride} po={po} pi={pi}")
    sp = (stride * po) // pi
    entries = []
    ts = set()
    for ai in range(pi):
        for ao in range(po):
            for u in range(k):
                num = u - ai - pad + stride * ao
                if num % pi:
                    continue
                t = num // pi
                entries.append((t, ai, ao, u))
                ts.add(t)
    tmin, tmax = min(ts), max(ts)
    pp = -tmin
    kp = tmax - tmin + 1
    return kp, pp, sp, [(t + pp, ai, ao, u) for t, ai, ao, u in entries]


@functools.lru_cache(maxsize=None)
def _pack_plan(
    kh: int, kw: int,
    stride: Tuple[int, int], pad: Tuple[int, int],
    in_pack: Tuple[int, int], out_pack: Tuple[int, int],
):
    """Constant selector plan: a one-hot S[kp_taps, pi, po, kh*kw] with
    S[t, ai, ao, u] = 1 iff original tap u feeds packed tap t at input
    phase ai / output phase ao (at most ONE u per (t, ai, ao)).

    The packed kernel is then the einsum S . w — a tiny vectorized matmul.
    (The previous formulation gathered w.flat[idx], which XLA:TPU lowers to
    a ~1.4 ms serial loop PER KERNEL PER WEIGHT VERSION — with layer3 packed
    that was ~70 ms/step of pure gather; the einsum is ~microseconds and has
    an equally cheap transpose-einsum VJP for the weight gradient.)
    """
    pih, piw = in_pack
    poh, pow_ = out_pack
    kph, pph, sph, ents_h = _tap_map_1d(kh, stride[0], pad[0], pih, poh)
    kpw, ppw, spw, ents_w = _tap_map_1d(kw, stride[1], pad[1], piw, pow_)
    sel = np.zeros((kph * kpw, pih * piw, poh * pow_, kh * kw), np.float32)
    for th, aih, aoh, uh in ents_h:
        for tw, aiw, aow, uw in ents_w:
            # packed channel layout must match space_to_depth: (a_h, a_w, c)
            sel[th * kpw + tw, aih * piw + aiw, aoh * pow_ + aow,
                uh * kw + uw] = 1.0
    return sel, (kph, kpw), (sph, spw), (pph, ppw)


def pack_conv_kernel(
    w: jax.Array,
    stride: Tuple[int, int],
    pad: Tuple[int, int],
    in_pack: Tuple[int, int],
    out_pack: Tuple[int, int],
):
    """Rearrange an HWIO kernel for packed-domain convolution.

    Returns (wp, packed_strides, packed_pad_lo). Padding-high must be
    computed from the actual input/output sizes (see packed_conv).
    """
    kh, kw, ci, co = w.shape
    sel, (kph, kpw), sp, pp = _pack_plan(
        kh, kw, tuple(stride), tuple(pad), tuple(in_pack), tuple(out_pack))
    pi, po = sel.shape[1], sel.shape[2]
    # one-hot selection: each (t, ai, ao) row has at most one 1, so the
    # einsum is EXACT (a copy-or-zero, not an accumulation)
    wp = jnp.einsum(
        "tpqu,ucd->tpcqd",
        jnp.asarray(sel, w.dtype),
        w.reshape(kh * kw, ci, co),
        precision=jax.lax.Precision.HIGHEST,
    )
    wp = wp.reshape(kph, kpw, pi * ci, po * co)
    return wp, sp, pp


def packed_conv(
    x: jax.Array,
    w: jax.Array,
    stride: Tuple[int, int],
    pad: Tuple[int, int],
    in_pack: Tuple[int, int],
    out_pack: Tuple[int, int],
) -> jax.Array:
    """Convolve packed input with an original-weights kernel, exactly.

    x: [N, Hp, Wp, pi_h*pi_w*ci] packed input (space_to_depth layout).
    w: [kh, kw, ci, co] ORIGINAL kernel.
    Output: [N, Hp', Wp', po_h*po_w*co] packed by out_pack.
    """
    if tuple(in_pack) == (1, 1) and tuple(out_pack) == (1, 1):
        return jax.lax.conv_general_dilated(
            x, w, stride, [(pad[0], pad[0]), (pad[1], pad[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
    wp, sp, pp = pack_conv_kernel(w, stride, pad, in_pack, out_pack)
    n, hp, wpx, _ = x.shape
    # logical output size of the original conv
    h = hp * in_pack[0]
    wd = wpx * in_pack[1]
    oh = (h + 2 * pad[0] - w.shape[0]) // stride[0] + 1
    ow = (wd + 2 * pad[1] - w.shape[1]) // stride[1] + 1
    if oh % out_pack[0] or ow % out_pack[1]:
        raise ValueError(
            f"conv output {oh}x{ow} not divisible by out_pack {out_pack}; "
            "packed execution would silently truncate — use a compatible "
            "shape or out_pack=(1, 1)")
    ohp, owp = oh // out_pack[0], ow // out_pack[1]
    # pad-high chosen so the packed conv emits exactly (ohp, owp)
    ph_hi = (ohp - 1) * sp[0] + wp.shape[0] - hp - pp[0]
    pw_hi = (owp - 1) * sp[1] + wp.shape[1] - wpx - pp[1]
    return jax.lax.conv_general_dilated(
        x, wp, sp, [(pp[0], ph_hi), (pp[1], pw_hi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


class PackedConv(nn.Module):
    """Drop-in for the trunk's nn.Conv in the packed domain.

    Declares the ORIGINAL kernel (and optional bias) parameters — same
    names/shapes/inits as the unpacked nn.Conv, so parameter trees are
    identical — and applies them with :func:`packed_conv`. The default
    kernel_init matches the DRN trunk's _conv; bias-carrying trunks (VGG)
    pass flax's nn.Conv defaults.
    """

    features: int
    kernel: int
    stride: int = 1
    in_pack: Tuple[int, int] = (1, 1)
    out_pack: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    use_bias: bool = False
    kernel_init: Any = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1] // (self.in_pack[0] * self.in_pack[1])
        w = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel, self.kernel, ci, self.features),
            jnp.float32,
        )
        pad = self.kernel // 2
        y = packed_conv(
            x.astype(self.dtype), w.astype(self.dtype),
            (self.stride, self.stride), (pad, pad), self.in_pack, self.out_pack)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            # packed channel layout is (offset, c): tile per-channel bias
            # across the out_pack offset groups (same as PackedBatchNorm)
            y = y + jnp.tile(b.astype(self.dtype),
                             self.out_pack[0] * self.out_pack[1])
        return y


class PackedBatchNorm(nn.Module):
    """BatchNorm over packed channels: per-ORIGINAL-channel statistics.

    Variable names/shapes match flax nn.BatchNorm ([C] scale/bias params,
    [C] mean/var batch stats), so trees are interchangeable with the
    unpacked trunk. Stats in train mode average the packed groups — the same
    element multiset as the unpacked reduction, so results agree to float
    reduction order. Semantics mirror flax BatchNorm (momentum-EMA running
    stats, biased batch variance, f32 stats, compute in ``dtype``).
    """

    groups: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.groups
        c = x.shape[-1] // p
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if train:
            # stats in the promoted dtype, like flax _compute_stats (f32 for
            # bf16/f32 activations; f64 under the x64 test oracle)
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            gm = jnp.mean(xf, axis=(0, 1, 2)).reshape(p, c)
            gm2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2)).reshape(p, c)
            mean = gm.mean(axis=0)
            var = gm2.mean(axis=0) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean)
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(self.dtype)
        sub = (mean * jax.lax.rsqrt(var + self.epsilon) * scale - bias).astype(
            self.dtype)
        return x * jnp.tile(mul, p) - jnp.tile(sub, p)


class PackedBasicBlock(nn.Module):
    """Packed-domain twin of models.drn.BasicBlock (same variable tree).

    Residual adds and ReLU commute with space-to-depth (elementwise), so only
    the convs/BNs need packed twins. Dilation is always 1 at levels 1-2.
    """

    features: int
    stride: int = 1
    in_pack: Tuple[int, int] = (1, 1)
    out_pack: Tuple[int, int] = (1, 1)
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        po = self.out_pack
        gp = po[0] * po[1]
        bn_kw = dict(groups=gp, momentum=self.momentum, epsilon=self.epsilon,
                     dtype=self.dtype)
        in_features = x.shape[-1] // (self.in_pack[0] * self.in_pack[1])
        needs_proj = self.stride != 1 or in_features != self.features
        if not needs_proj and self.in_pack != po:
            # The residual add below would mix differently-packed tensors
            # (shape mismatch or silent garbage). No current geometry hits
            # this; fail loudly if a future one does.
            raise ValueError(
                f"PackedBasicBlock without projection requires in_pack == "
                f"out_pack, got {self.in_pack} vs {po}")
        identity = x
        y = PackedConv(self.features, 3, self.stride, in_pack=self.in_pack,
                       out_pack=po, dtype=self.dtype, name="conv1")(x)
        y = PackedBatchNorm(name="bn1", **bn_kw)(y, train)
        y = nn.relu(y)
        y = PackedConv(self.features, 3, 1, in_pack=po, out_pack=po,
                       dtype=self.dtype, name="conv2")(y)
        y = PackedBatchNorm(name="bn2", **bn_kw)(y, train)
        if needs_proj:
            identity = PackedConv(
                self.features, 1, self.stride, in_pack=self.in_pack,
                out_pack=po, dtype=self.dtype, name="proj_conv")(x)
            identity = PackedBatchNorm(name="proj_bn", **bn_kw)(identity, train)
        return nn.relu(y + identity)


class PackedResStage(nn.Module):
    """Packed-domain twin of models.drn.ResStage for BasicBlock levels 1-2
    of arch-C trunks (dilation 1, same variable tree)."""

    features: int
    n_blocks: int
    stride: int = 1
    in_pack: Tuple[int, int] = (1, 1)
    out_pack: Tuple[int, int] = (1, 1)
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_kw = dict(momentum=self.momentum, epsilon=self.epsilon)
        x = PackedBasicBlock(
            features=self.features, stride=self.stride, in_pack=self.in_pack,
            out_pack=self.out_pack, dtype=self.dtype, name="block0",
            **bn_kw)(x, train)
        for i in range(1, self.n_blocks):
            x = PackedBasicBlock(
                features=self.features, in_pack=self.out_pack,
                out_pack=self.out_pack, dtype=self.dtype,
                name=f"block{i}", **bn_kw)(x, train)
        return x


class PackedConvStage(nn.Module):
    """Packed-domain twin of models.drn.ConvStage (same variable tree)."""

    features: int
    n_layers: int
    stride: int = 1
    in_pack: Tuple[int, int] = (1, 1)
    out_pack: Tuple[int, int] = (1, 1)
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pk = self.in_pack
        for i in range(self.n_layers):
            s = self.stride if i == 0 else 1
            x = PackedConv(
                self.features, 3, s, in_pack=pk, out_pack=self.out_pack,
                dtype=self.dtype, name=f"conv{i}")(x)
            pk = self.out_pack
            x = PackedBatchNorm(
                groups=pk[0] * pk[1], momentum=self.momentum,
                epsilon=self.epsilon, dtype=self.dtype, name=f"bn{i}")(x, train)
            x = nn.relu(x)
        return x
