"""Introspection FCN: MobileNetV2-dilated encoder + C1-DeepSup decoder.

The IV in IV-SLAM: predicts a per-pixel cost map of feature unreliability
from a raw image. Mirrors the reference's jackal recipe
(config/jackal/jackal_mobilenetv2dialated-c1_deepsup_reg.yaml:
fc_dim=320, regression mode, deep supervision x0.4) and the TorchScript
inference wrapper (networks/models_light/models_light.py:18-28) whose
output sharpening is sigmoid(20 * (pred - 0.5)).

Flax/NHWC; under a device mesh the BatchNorm axis_name turns into the
reference's synchronized BN with a single lax.pmean.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mobilenet import ConvBN, MobileNetV2Dilated

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class C1DeepSup(nn.Module):
    """3x3 conv-bn-relu + 1x1 head, plus a deep-supervision branch off the
    stage-14 tap (networks/models/models.py:347-384, regression mode)."""

    num_class: int = 1
    fc_dim: int = 320
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, train: bool = False):
        conv5 = conv_out[-1]
        x = ConvBN(
            self.fc_dim // 4, kernel=3, relu6=False,
            axis_name=self.axis_name, dtype=self.dtype,
        )(conv5, train)
        x = nn.relu(x)
        x = nn.Conv(self.num_class, (1, 1), dtype=self.dtype, name="conv_last")(x)
        if not train:
            return x
        conv4 = conv_out[-2]
        y = ConvBN(
            self.fc_dim // 4, kernel=3, relu6=False,
            axis_name=self.axis_name, dtype=self.dtype,
        )(conv4, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.num_class, (1, 1), dtype=self.dtype, name="conv_last_deepsup"
        )(y)
        return x, y


class IntrospectionNet(nn.Module):
    """Training-mode network: returns (pred, deepsup_pred) at stride 8."""

    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MobileNetV2Dilated(
            axis_name=self.axis_name, dtype=self.dtype, name="encoder"
        )(x, train)
        return C1DeepSup(
            axis_name=self.axis_name, dtype=self.dtype, name="decoder"
        )(feats, train)


def normalize_image(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB (..., H, W, 3) -> ImageNet-normalized float."""
    x = img_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


def inference_cost_map(
    model: IntrospectionNet,
    variables,
    img_u8: jnp.ndarray,
    out_hw: Tuple[int, int],
    net_hw: Tuple[int, int] = (512, 512),
) -> jnp.ndarray:
    """Full inference path of the exported light model
    (models_light.py:18-28 + stereo_kitti.cc:492-517): resize to the network
    input, forward, bilinear-resize the stride-8 prediction to `out_hw`,
    sharpen with sigmoid(20 (x - 0.5)), scale to a uint8 cost map."""
    x = normalize_image(img_u8)
    if x.ndim == 3:
        x = x[None]
    x = jax.image.resize(
        x, (x.shape[0], net_hw[0], net_hw[1], 3), method="bilinear"
    )
    pred = model.apply(variables, x, train=False)
    pred = jax.image.resize(
        pred, (pred.shape[0], out_hw[0], out_hw[1], 1), method="bilinear"
    )
    pred = jax.nn.sigmoid(20.0 * (pred - 0.5))
    cost = jnp.clip(pred[..., 0] * 255.0, 0, 255).astype(jnp.uint8)
    return cost[0] if img_u8.ndim == 3 else cost
