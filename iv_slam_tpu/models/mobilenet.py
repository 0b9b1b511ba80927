"""MobileNetV2-dilated encoder in Flax (NHWC, TPU layout).

Architecture mirrors the reference's mobilenetv2dilated encoder
(networks/models/mobilenet.py + MobileNetV2Dilated surgery at
networks/models/models.py:291-345): the ImageNet MobileNetV2 feature stack
minus the final 1x1x1280 layer (18 stages), with output-stride 8 via
dilation — stages 7..13 run at dilation 2 and stages 14..17 at dilation 4,
their stride-2 depthwise convs flattened to stride 1.

Feature taps match `down_idx = [2, 4, 7, 14]` + final: C1-DeepSup consumes
the 320-channel final map and the 160-channel stage-14 map.

BatchNorm carries an optional `axis_name` — under pmap/shard_map this is
exactly the reference's vendored Synchronized-BatchNorm
(lib/nn/modules/batchnorm.py), collapsed into one lax.pmean.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (expansion t, channels c, repeats n, stride s) — standard MobileNetV2
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
DOWN_IDX = (2, 4, 7, 14)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    relu6: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x)
        if self.relu6:
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 6
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = round(inp * self.expand)
        use_res = self.stride == 1 and inp == self.features
        y = x
        if self.expand != 1:
            y = ConvBN(
                hidden, kernel=1, axis_name=self.axis_name, dtype=self.dtype
            )(y, train)
        y = ConvBN(
            hidden,
            kernel=3,
            stride=self.stride,
            dilation=self.dilation,
            groups=hidden,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(y, train)
        y = ConvBN(
            self.features, kernel=1, relu6=False,
            axis_name=self.axis_name, dtype=self.dtype,
        )(y, train)
        return x + y if use_res else y


def _dilated_plan() -> List[Tuple[int, int, int, int]]:
    """Per-stage (channels, stride, expand, dilation) after the output-stride-8
    surgery. Stage 0 is the stem conv."""
    stages = []
    for t, c, n, s in INVERTED_RESIDUAL_SETTING:
        for i in range(n):
            stages.append((c, s if i == 0 else 1, t))
    plan = []
    for idx, (c, s, t) in enumerate(stages, start=1):  # features[1..17]
        if idx < 7:
            dil, stride = 1, s
        elif idx < 14:
            # dilate=2 region: stride-2 conv -> stride 1 dilation 1
            dil = 1 if s == 2 else 2
            stride = 1 if s == 2 else s
        else:
            # dilate=4 region: stride-2 conv -> stride 1 dilation 2
            dil = 2 if s == 2 else 4
            stride = 1 if s == 2 else s
        plan.append((c, stride, t, dil))
    return plan


class MobileNetV2Dilated(nn.Module):
    """Output-stride-8 encoder. Returns [tap2, tap4, tap7, tap14, final]."""

    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        taps = []
        x = ConvBN(
            32, kernel=3, stride=2, axis_name=self.axis_name, dtype=self.dtype
        )(x, train)  # features[0]
        for idx, (c, stride, t, dil) in enumerate(_dilated_plan(), start=1):
            x = InvertedResidual(
                c, stride=stride, expand=t, dilation=dil,
                axis_name=self.axis_name, dtype=self.dtype,
            )(x, train)
            if idx in DOWN_IDX:
                taps.append(x)
        taps.append(x)
        return taps
