"""Introspection-FCN model zoo (Flax / NHWC).

TPU-native rebuild of the reference's ModelBuilder encoder/decoder zoo
(networks/models/models.py:77-177):

encoders
  mobilenetv2dilated            models/mobilenet.py (this package)
  resnet18 / resnet18dilated    models.py:190-226 Resnet / 228-291 ResnetDilated
  resnet50 / resnet50dilated      over networks/models/resnet.py (deep 3-conv
  resnet101 / resnet101dilated    stem, BasicBlock/Bottleneck, layers
                                  [2,2,2,2]/[3,4,6,3]/[3,4,23,3])
  resnext101                    networks/models/resnext.py (GroupBottleneck,
                                groups=32, expansion 2, layers [3,4,23,3])
  hrnetv2                       networks/models/hrnet.py (HRNetV2-W48:
                                4-branch high-resolution stages, final
                                concat of upsampled branches, 720 channels)

decoders
  c1 / c1_deepsup               models.py:346-436 (c1_deepsup lives in
                                introspection.py — the flagship recipe)
  ppm / ppm_deepsup             models.py:439-533 (pyramid pooling 1/2/3/6)
  upernet / upernet_lite        models.py:536-627 (PPM head + FPN fusion,
                                fpn_dim 512 / 256)

All BatchNorms take an optional `axis_name`; under a sharded mesh that is
the reference's vendored Synchronized-BatchNorm (lib/nn/modules/) collapsed
into one cross-replica mean. Dilation surgery reproduces `_nostride_dilate`
(models.py:258-271): stride-2 convs become stride 1, 3x3 kernels get
dilation `d/2` (the formerly-strided conv) or `d` (the rest).

Unlike the reference (NCHW, align_corners=False interpolate), feature maps
are NHWC for TPU conv layout; `jax.image.resize(..., "bilinear")` uses the
same half-pixel convention as align_corners=False.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ENCODER_FC_DIM = {
    "mobilenetv2dilated": 320,
    "resnet18": 512,
    "resnet18dilated": 512,
    "resnet50": 2048,
    "resnet50dilated": 2048,
    "resnet101": 2048,
    "resnet101dilated": 2048,
    "resnext101": 2048,
    "hrnetv2": 720,
}


class ConvBNAct(nn.Module):
    """conv -> BN -> optional ReLU (the zoo's conv3x3_bn_relu and friends)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name, dtype=self.dtype,
        )(x)
        return nn.relu(x) if self.act else x


def _resize_to(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC maps (torch align_corners=False semantics)."""
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[3]), method="bilinear"
    )


def adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """nn.AdaptiveAvgPool2d(out) over NHWC: mean over the torch bin split
    [floor(i*H/out), ceil((i+1)*H/out))."""
    _, h, w, _ = x.shape
    rows = []
    for i in range(out):
        y0, y1 = (i * h) // out, -((-(i + 1) * h) // out)
        cols = []
        for j in range(out):
            x0, x1 = (j * w) // out, -((-(j + 1) * w) // out)
            cols.append(jnp.mean(x[:, y0:y1, x0:x1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (N, out, out, C)


# --------------------------------------------------------------- ResNet(-X)


class BasicBlock(nn.Module):
    """resnet.py:24-53; dilation pair = (conv1, conv2) after surgery."""

    planes: int
    stride: int = 1
    dilation: Tuple[int, int] = (1, 1)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = dict(axis_name=self.axis_name, dtype=self.dtype)
        y = ConvBNAct(self.planes, 3, self.stride,
                      dilation=self.dilation[0], **cfg)(x, train)
        y = ConvBNAct(self.planes, 3, 1, dilation=self.dilation[1],
                      act=False, **cfg)(y, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = ConvBNAct(self.planes, 1, self.stride, act=False, **cfg)(
                x, train)
        return nn.relu(x + y)


class Bottleneck(nn.Module):
    """resnet.py:56-93 (expansion 4) and resnext.py:23-60 (expansion 2,
    grouped 3x3) in one module."""

    planes: int
    stride: int = 1
    dilation: int = 1      # applies to the 3x3 conv only
    expansion: int = 4
    groups: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = dict(axis_name=self.axis_name, dtype=self.dtype)
        out_ch = self.planes * self.expansion
        y = ConvBNAct(self.planes, 1, 1, **cfg)(x, train)
        y = ConvBNAct(self.planes, 3, self.stride, dilation=self.dilation,
                      groups=self.groups, **cfg)(y, train)
        y = ConvBNAct(out_ch, 1, 1, act=False, **cfg)(y, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = ConvBNAct(out_ch, 1, self.stride, act=False, **cfg)(x, train)
        return nn.relu(x + y)


class ResNetEncoder(nn.Module):
    """Deep-stem ResNet/ResNeXt feature extractor returning the four stage
    maps (models.py:190-291 Resnet/ResnetDilated over resnet.py/resnext.py).

    dilate_scale: 1 = plain (output stride 32); 8 = layer3 d2 + layer4 d4
    (output stride 8); 16 = layer4 d2.
    """

    layers: Sequence[int] = (2, 2, 2, 2)
    block: str = "basic"            # basic | bottleneck | group_bottleneck
    dilate_scale: int = 1
    groups: int = 1
    planes0: int = 64               # 128 for resnext (planes 128..1024)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        cfg = dict(axis_name=self.axis_name, dtype=self.dtype)
        # deep 3-conv stem (resnet.py:100-110): 3->64 s2, 64->64, 64->128
        x = ConvBNAct(64, 3, 2, **cfg)(x, train)
        x = ConvBNAct(64, 3, 1, **cfg)(x, train)
        x = ConvBNAct(128, 3, 1, **cfg)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        dilate = {1: (1, 1), 16: (1, 2), 8: (2, 4)}[self.dilate_scale]
        out = []
        for stage in range(4):
            planes = self.planes0 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            d = 1
            if stage == 2:
                d = dilate[0]
            elif stage == 3:
                d = dilate[1]
            for blk in range(self.layers[stage]):
                s = stride if blk == 0 else 1
                if d > 1 and blk == 0:
                    # _nostride_dilate: the stride-2 3x3 conv becomes
                    # stride 1 with dilation d/2 (models.py:258-271)
                    s, d_strided = 1, max(d // 2, 1)
                else:
                    d_strided = d
                if self.block == "basic":
                    x = BasicBlock(
                        planes, s, dilation=(d_strided, d), **cfg
                    )(x, train)
                else:
                    exp = 2 if self.block == "group_bottleneck" else 4
                    x = Bottleneck(
                        planes, s, dilation=d_strided, expansion=exp,
                        groups=self.groups, **cfg,
                    )(x, train)
            out.append(x)
        return out


# ------------------------------------------------------------------ HRNet


class HRModule(nn.Module):
    """HighResolutionModule (hrnet.py:105-250): per-branch BasicBlock
    chains + full cross-resolution fusion."""

    num_channels: Sequence[int]
    num_blocks: int = 4
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        cfg = dict(axis_name=self.axis_name, dtype=self.dtype)
        n = len(self.num_channels)
        xs = list(xs)
        for i in range(n):
            for _ in range(self.num_blocks):
                xs[i] = BasicBlock(self.num_channels[i], 1, **cfg)(
                    xs[i], train)
        fused = []
        for i in range(n):
            y = None
            for j in range(n):
                if j == i:
                    t = xs[j]
                elif j > i:
                    # 1x1 conv+BN then bilinear upsample (hrnet.py:186-194)
                    t = ConvBNAct(self.num_channels[i], 1, 1, act=False,
                                  **cfg)(xs[j], train)
                    t = _resize_to(t, xs[i].shape[1:3])
                else:
                    # (i-j) strided 3x3 conv+BN, ReLU on all but the last
                    t = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.num_channels[i] if last \
                            else self.num_channels[j]
                        t = ConvBNAct(ch, 3, 2, act=not last, **cfg)(t, train)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class HRNetV2(nn.Module):
    """HRNetV2-W48 encoder (hrnet.py:259-442): stem /4, Bottleneck layer1,
    three multi-branch stages, final upsample-and-concat -> one 720-channel
    stride-4 map (returned as a single-element list, like the reference)."""

    width: int = 48
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        cfg = dict(axis_name=self.axis_name, dtype=self.dtype)
        w = self.width
        stage_channels = [
            [w, 2 * w],
            [w, 2 * w, 4 * w],
            [w, 2 * w, 4 * w, 8 * w],
        ]
        num_modules = [1, 4, 3]

        x = ConvBNAct(64, 3, 2, **cfg)(x, train)
        x = ConvBNAct(64, 3, 2, **cfg)(x, train)
        for _ in range(4):
            x = Bottleneck(64, 1, **cfg)(x, train)  # -> 256 ch

        xs = [x]
        for stage in range(3):
            chans = stage_channels[stage]
            # transition (hrnet.py:311-345): reuse branches whose channel
            # count already matches; new/changed branches get a 3x3 conv
            # (stride 2 when downsampling a new branch). Inputs follow the
            # reference's forward exactly: an existing branch feeds its own
            # map; a new branch consumes the LAST previous branch.
            nxt = []
            for i, ch in enumerate(chans):
                if i < len(xs) and xs[i].shape[-1] == ch:
                    nxt.append(xs[i])
                elif i < len(xs):
                    nxt.append(ConvBNAct(ch, 3, 1, **cfg)(xs[-1], train))
                else:
                    nxt.append(ConvBNAct(ch, 3, 2, **cfg)(xs[-1], train))
            xs = nxt
            for _ in range(num_modules[stage]):
                xs = HRModule(chans, axis_name=self.axis_name,
                              dtype=self.dtype)(xs, train)

        hw = xs[0].shape[1:3]
        cat = jnp.concatenate(
            [xs[0]] + [_resize_to(b, hw) for b in xs[1:]], axis=-1
        )
        return [cat]


# ---------------------------------------------------------------- decoders


class C1(nn.Module):
    """Plain last-conv decoder (models.py:385-414)."""

    num_class: int = 1
    fc_dim: int = 320
    regression_mode: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, train: bool = False):
        cfg = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = ConvBNAct(self.fc_dim // 4, 3, 1, **cfg)(conv_out[-1], train)
        x = nn.Conv(self.num_class, (1, 1), dtype=self.dtype,
                    name="conv_last")(x)
        if not self.regression_mode:
            x = jax.nn.log_softmax(x, axis=-1)
        return x


class PPMCore(nn.Module):
    """Pyramid pooling over conv5 (models.py:426-457): pool to 1/2/3/6,
    1x1 conv to 512, upsample, concat with conv5."""

    pool_scales: Sequence[int] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv5, train: bool = False):
        cfg = dict(axis_name=self.axis_name, dtype=self.dtype)
        hw = conv5.shape[1:3]
        outs = [conv5]
        for s in self.pool_scales:
            p = adaptive_avg_pool(conv5, s)
            p = ConvBNAct(512, 1, 1, **cfg)(p, train)
            outs.append(_resize_to(p, hw))
        return jnp.concatenate(outs, axis=-1)


class PPM(nn.Module):
    """models.py:417-467 (dropout 0.1 before the class conv)."""

    num_class: int = 1
    fc_dim: int = 2048
    regression_mode: bool = True
    deep_sup: bool = False    # PPMDeepsup (models.py:470-533)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, train: bool = False):
        cfg = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = PPMCore(axis_name=self.axis_name, dtype=self.dtype)(
            conv_out[-1], train)
        x = ConvBNAct(512, 3, 1, **cfg)(x, train)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Conv(self.num_class, (1, 1), dtype=self.dtype,
                    name="conv_last")(x)
        if not self.regression_mode:
            x = jax.nn.log_softmax(x, axis=-1)
        if not (train and self.deep_sup):
            return x
        y = ConvBNAct(self.fc_dim // 4, 3, 1, **cfg)(conv_out[-2], train)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        y = nn.Conv(self.num_class, (1, 1), dtype=self.dtype,
                    name="conv_last_deepsup")(y)
        if not self.regression_mode:
            y = jax.nn.log_softmax(y, axis=-1)
        return x, y


class UPerNet(nn.Module):
    """PPM head on conv5 + FPN top-down fusion over all stage maps
    (models.py:536-627). fpn_dim 512 = 'upernet', 256 = 'upernet_lite'.
    The lateral input channels are read from the feature maps (the
    reference hard-codes ResNet's (256,512,1024,2048))."""

    num_class: int = 1
    fpn_dim: int = 256
    regression_mode: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, train: bool = False):
        cfg = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = PPMCore(axis_name=self.axis_name, dtype=self.dtype)(
            conv_out[-1], train)
        f = ConvBNAct(self.fpn_dim, 3, 1, **cfg)(x, train)

        fpn = [f]
        for i in reversed(range(len(conv_out) - 1)):
            lateral = ConvBNAct(self.fpn_dim, 1, 1, **cfg)(conv_out[i], train)
            f = lateral + _resize_to(f, lateral.shape[1:3])
            fpn.append(ConvBNAct(self.fpn_dim, 3, 1, **cfg)(f, train))
        fpn.reverse()

        hw = fpn[0].shape[1:3]
        fused = jnp.concatenate(
            [fpn[0]] + [_resize_to(m, hw) for m in fpn[1:]], axis=-1
        )
        x = ConvBNAct(self.fpn_dim, 3, 1, **cfg)(fused, train)
        x = nn.Conv(self.num_class, (1, 1), dtype=self.dtype,
                    name="conv_last")(x)
        if not self.regression_mode:
            x = jax.nn.log_softmax(x, axis=-1)
        return x


# ----------------------------------------------------------------- builder


def build_encoder(
    arch: str = "mobilenetv2dilated",
    axis_name: Optional[str] = None,
    dtype: Any = jnp.float32,
    name: Optional[str] = None,
) -> nn.Module:
    """ModelBuilder.build_encoder (models.py:78-124)."""
    arch = arch.lower()
    kw = dict(axis_name=axis_name, dtype=dtype, name=name)
    if arch == "mobilenetv2dilated":
        from .mobilenet import MobileNetV2Dilated

        return MobileNetV2Dilated(**kw)
    if arch in ("resnet18", "resnet18dilated"):
        return ResNetEncoder(
            layers=(2, 2, 2, 2), block="basic",
            dilate_scale=8 if arch.endswith("dilated") else 1, **kw,
        )
    if arch in ("resnet50", "resnet50dilated"):
        return ResNetEncoder(
            layers=(3, 4, 6, 3), block="bottleneck",
            dilate_scale=8 if arch.endswith("dilated") else 1, **kw,
        )
    if arch in ("resnet101", "resnet101dilated"):
        return ResNetEncoder(
            layers=(3, 4, 23, 3), block="bottleneck",
            dilate_scale=8 if arch.endswith("dilated") else 1, **kw,
        )
    if arch == "resnext101":
        return ResNetEncoder(
            layers=(3, 4, 23, 3), block="group_bottleneck",
            groups=32, planes0=128, **kw,
        )
    if arch == "hrnetv2":
        return HRNetV2(**kw)
    raise ValueError(f"Architecture undefined: {arch!r}")


def build_decoder(
    arch: str = "c1_deepsup",
    fc_dim: int = 320,
    num_class: int = 1,
    regression_mode: bool = True,
    axis_name: Optional[str] = None,
    dtype: Any = jnp.float32,
    name: Optional[str] = None,
) -> nn.Module:
    """ModelBuilder.build_decoder (models.py:126-177)."""
    arch = arch.lower()
    kw = dict(num_class=num_class, axis_name=axis_name, dtype=dtype,
              name=name)
    if arch == "c1_deepsup":
        from .introspection import C1DeepSup

        return C1DeepSup(fc_dim=fc_dim, num_class=num_class,
                         axis_name=axis_name, dtype=dtype, name=name)
    if arch == "c1":
        return C1(fc_dim=fc_dim, regression_mode=regression_mode, **kw)
    if arch == "ppm":
        return PPM(fc_dim=fc_dim, regression_mode=regression_mode, **kw)
    if arch == "ppm_deepsup":
        return PPM(fc_dim=fc_dim, regression_mode=regression_mode,
                   deep_sup=True, **kw)
    if arch == "upernet":
        return UPerNet(fpn_dim=512, regression_mode=regression_mode, **kw)
    if arch == "upernet_lite":
        return UPerNet(fpn_dim=256, regression_mode=regression_mode, **kw)
    raise ValueError(f"Architecture undefined: {arch!r}")


class SegmentationModel(nn.Module):
    """Encoder + decoder pair built by arch name — the zoo counterpart of
    SegmentationModule (models.py:23-61); loss lives in train/losses.py
    (functional JAX has no DataParallel forward-loss constraint)."""

    arch_encoder: str = "mobilenetv2dilated"
    arch_decoder: str = "c1_deepsup"
    fc_dim: int = 0                  # 0 = infer from the encoder arch
    num_class: int = 1
    regression_mode: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fc_dim = self.fc_dim or ENCODER_FC_DIM[self.arch_encoder.lower()]
        feats = build_encoder(
            self.arch_encoder, self.axis_name, self.dtype, name="encoder"
        )(x, train)
        return build_decoder(
            self.arch_decoder, fc_dim, self.num_class, self.regression_mode,
            self.axis_name, self.dtype, name="decoder",
        )(feats, train)
