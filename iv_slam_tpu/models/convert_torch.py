"""Convert reference PyTorch checkpoints to Flax variables.

Maps the reference's encoder/decoder state_dicts (training/train_modular.py
snapshots: encoder_*.pth / decoder_*.pth with MobileNetV2 `features.N...`
naming and C1-DeepSup `cbr/conv_last/...` naming) onto the Flax module tree
of models/introspection.py, so users of the reference's pretrained
introspection models (e.g. iv_jackal_mobilenet_c1deepsup_light.pt weights)
can run them here.

Layout notes: torch convs are OIHW, flax HWIO; torch depthwise convs are
(C, 1, H, W) -> flax (H, W, 1, C); BN {weight, bias, running_mean,
running_var} -> {scale, bias} + batch_stats {mean, var}.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_w(t: np.ndarray, depthwise: bool = False) -> np.ndarray:
    if depthwise:
        # torch (C, 1, kH, kW) -> flax (kH, kW, 1, C)
        return np.transpose(t, (2, 3, 1, 0))
    # torch (O, I, kH, kW) -> flax (kH, kW, I, O)
    return np.transpose(t, (2, 3, 1, 0))


def _bn(prefix: str, sd: Dict[str, np.ndarray]):
    return (
        dict(scale=sd[prefix + ".weight"], bias=sd[prefix + ".bias"]),
        dict(mean=sd[prefix + ".running_mean"], var=sd[prefix + ".running_var"]),
    )


def convert_encoder(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """MobileNetV2 `features.*` state_dict -> (params, batch_stats) for
    models/mobilenet.MobileNetV2Dilated."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def put(module_name, conv_w, bn_p, bn_s):
        params[module_name] = {
            "Conv_0": {"kernel": conv_w},
            "BatchNorm_0": bn_p,
        }
        stats[module_name] = {"BatchNorm_0": bn_s}

    # stem: features.0 = Conv + BN
    bn_p, bn_s = _bn("features.0.1", sd)
    put("ConvBN_0", _conv_w(sd["features.0.0.weight"]), bn_p, bn_s)

    # inverted residual blocks: features.1..17
    for idx in range(1, 18):
        base = f"features.{idx}.conv"
        block = f"InvertedResidual_{idx - 1}"
        sub_params: dict = {}
        sub_stats: dict = {}
        # torch Sequential: [pw conv, bn, relu] [dw conv, bn, relu] [pw conv, bn]
        conv_keys = [k for k in sd if k.startswith(base + ".") and
                     k.endswith(".weight") and "running" not in k]
        # identify conv layers by weight rank
        conv_idx = sorted(
            {int(k.split(".")[3]) for k in conv_keys
             if sd[k].ndim == 4}
        )
        bn_idx = sorted(
            {int(k.split(".")[3]) for k in conv_keys
             if sd[k].ndim == 1}
        )
        for ci, (c, b) in enumerate(zip(conv_idx, bn_idx)):
            w = sd[f"{base}.{c}.weight"]
            depthwise = w.shape[1] == 1 and w.shape[2] == 3
            bn_p, bn_s = _bn(f"{base}.{b}", sd)
            sub_params[f"ConvBN_{ci}"] = {
                "Conv_0": {"kernel": _conv_w(w, depthwise)},
                "BatchNorm_0": bn_p,
            }
            sub_stats[f"ConvBN_{ci}"] = {"BatchNorm_0": bn_s}
        params[block] = sub_params
        stats[block] = sub_stats
    return params, stats


def convert_decoder(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """C1-DeepSup state_dict -> (params, batch_stats) for C1DeepSup."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    bn_p, bn_s = _bn("cbr.1", sd)
    bn_p2, bn_s2 = _bn("cbr_deepsup.1", sd)
    params = {
        "ConvBN_0": {
            "Conv_0": {"kernel": _conv_w(sd["cbr.0.weight"])},
            "BatchNorm_0": bn_p,
        },
        "ConvBN_1": {
            "Conv_0": {"kernel": _conv_w(sd["cbr_deepsup.0.weight"])},
            "BatchNorm_0": bn_p2,
        },
        "conv_last": {
            "kernel": _conv_w(sd["conv_last.weight"]),
            "bias": sd["conv_last.bias"],
        },
        "conv_last_deepsup": {
            "kernel": _conv_w(sd["conv_last_deepsup.weight"]),
            "bias": sd["conv_last_deepsup.bias"],
        },
    }
    stats = {
        "ConvBN_0": {"BatchNorm_0": bn_s},
        "ConvBN_1": {"BatchNorm_0": bn_s2},
    }
    return params, stats


def convert_checkpoint(encoder_pth: str, decoder_pth: str):
    """Load reference .pth snapshots -> flax variables dict."""
    import torch

    enc_sd = torch.load(encoder_pth, map_location="cpu")
    dec_sd = torch.load(decoder_pth, map_location="cpu")
    enc_p, enc_s = convert_encoder(
        {k: v.numpy() for k, v in enc_sd.items()}
    )
    dec_p, dec_s = convert_decoder(
        {k: v.numpy() for k, v in dec_sd.items()}
    )
    return {
        "params": {"encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }
