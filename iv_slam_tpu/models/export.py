"""Model export for deployment (training/export_model_light.py role).

The reference traces the inference-only network to TorchScript
(torch.jit.trace -> .pt consumed by libtorch in stereo_kitti.cc:231-247).
The JAX-native equivalent: jax.export serializes the jitted inference
function (resize -> encoder -> decoder -> sigmoid sharpening) to a
StableHLO artifact that any XLA runtime can load without Python model
code; weights ride along as captured constants.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from .introspection import IntrospectionNet, inference_cost_map


def export_inference(
    variables,
    out_path: str,
    out_hw: Tuple[int, int],
    net_hw: Tuple[int, int] = (512, 512),
):
    """Serialize the full cost-map inference function for (H, W) uint8 RGB
    inputs. Returns the serialized bytes (also written to out_path)."""
    from jax import export as jax_export

    net = IntrospectionNet()

    def fn(img_u8):
        return inference_cost_map(net, variables, img_u8, out_hw, net_hw)

    spec = jax.ShapeDtypeStruct((out_hw[0], out_hw[1], 3), jnp.uint8)
    exported = jax_export.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return blob


def load_inference(path: str):
    """Deserialize an exported inference function -> callable."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return lambda img: exported.call(img)
