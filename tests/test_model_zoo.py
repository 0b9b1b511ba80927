"""Model-zoo parity tests (networks/models/models.py ModelBuilder).

Shape/structure checks for every encoder/decoder arch the reference's
build_encoder/build_decoder dispatch supports (models.py:78-177):
output strides, channel counts (fc_dim table), deep-supervision tuples,
dilation surgery, and end-to-end encoder+decoder pairs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iv_slam_tpu.models import zoo


def _init_apply(mod, x, train=False, method=None):
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = mod.init(rngs, x, train=train)
    out = mod.apply(variables, x, train=train,
                    rngs={"dropout": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"] if train else False)
    return out[0] if train else out


X32 = jnp.asarray(
    np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
)


@pytest.mark.parametrize(
    "arch,stride,fc_dim",
    [
        ("resnet18", 32, 512),
        ("resnet18dilated", 8, 512),
        ("resnet50dilated", 8, 2048),
        ("resnext101", 32, 2048),
    ],
)
def test_resnet_family_shapes(arch, stride, fc_dim):
    enc = zoo.build_encoder(arch)
    feats = _init_apply(enc, X32)
    assert len(feats) == 4  # four stage maps (models.py:209-226)
    assert feats[-1].shape[-1] == fc_dim == zoo.ENCODER_FC_DIM[arch]
    assert feats[-1].shape[1] == 32 // stride
    # stage channel progression: x2 per stage (x expansion)
    assert feats[0].shape[-1] * 8 == feats[-1].shape[-1]


@pytest.mark.slow
def test_resnet101_dilated():
    enc = zoo.build_encoder("resnet101dilated")
    feats = _init_apply(enc, X32)
    assert feats[-1].shape == (1, 4, 4, 2048)
    # dilated: layers 3/4 keep the stride-8 resolution
    assert feats[1].shape[1:3] == feats[2].shape[1:3] == feats[3].shape[1:3]


def test_dilated_keeps_resolution():
    plain = _init_apply(zoo.build_encoder("resnet18"), X32)
    dil = _init_apply(zoo.build_encoder("resnet18dilated"), X32)
    assert plain[-1].shape[1] == 1   # 32/32
    assert dil[-1].shape[1] == 4     # 32/8
    # stages 1-2 identical strides in both
    assert plain[0].shape == dil[0].shape
    assert plain[1].shape == dil[1].shape


@pytest.mark.slow
def test_hrnetv2():
    enc = zoo.build_encoder("hrnetv2")
    feats = _init_apply(enc, X32)
    # single concatenated stride-4 map: 48+96+192+384 = 720 channels
    # (hrnet.py:420-431)
    assert len(feats) == 1
    assert feats[0].shape == (1, 8, 8, 720)


def _fake_conv_out(fc_dim=64, hw=4):
    """Stand-in encoder pyramid: strides 4/8/8/8, channels /8 /4 /2 /1."""
    rng = np.random.default_rng(1)
    chans = [fc_dim // 8, fc_dim // 4, fc_dim // 2, fc_dim]
    return [
        jnp.asarray(rng.normal(size=(1, hw, hw, c)).astype(np.float32))
        for c in chans
    ]


def test_c1_decoder():
    conv_out = _fake_conv_out()
    dec = zoo.build_decoder("c1", fc_dim=64)
    out = _init_apply(dec, conv_out)
    assert out.shape == (1, 4, 4, 1)


def test_ppm_decoder_eval_and_train():
    conv_out = _fake_conv_out()
    dec = zoo.build_decoder("ppm", fc_dim=64)
    out = _init_apply(dec, conv_out)
    assert out.shape == (1, 4, 4, 1)
    # deep-sup variant returns (pred, aux) in training (models.py:521-533)
    dec_ds = zoo.build_decoder("ppm_deepsup", fc_dim=64)
    out = _init_apply(dec_ds, conv_out, train=True)
    assert isinstance(out, tuple) and out[0].shape == out[1].shape == (
        1, 4, 4, 1)


def test_ppm_adaptive_pool():
    x = jnp.arange(36, dtype=jnp.float32).reshape(1, 6, 6, 1)
    p = zoo.adaptive_avg_pool(x, 2)
    assert p.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(
        np.asarray(p[0, :, :, 0]),
        [[np.mean([r * 6 + c for r in range(3) for c in range(3)]),
          np.mean([r * 6 + c for r in range(3) for c in range(3, 6)])],
         [np.mean([r * 6 + c for r in range(3, 6) for c in range(3)]),
          np.mean([r * 6 + c for r in range(3, 6) for c in range(3, 6)])]],
    )


def test_upernet_decoder():
    conv_out = _fake_conv_out()
    for arch, fpn_dim in [("upernet_lite", 256), ("upernet", 512)]:
        dec = zoo.build_decoder(arch, fc_dim=64)
        assert dec.fpn_dim == fpn_dim
    out = _init_apply(zoo.build_decoder("upernet_lite", fc_dim=64), conv_out)
    # fused at the finest lateral resolution
    assert out.shape == (1, 4, 4, 1)


def test_segmentation_classes_log_softmax():
    conv_out = _fake_conv_out()
    dec = zoo.build_decoder("c1", fc_dim=64, num_class=5,
                            regression_mode=False)
    out = _init_apply(dec, conv_out)
    assert out.shape[-1] == 5
    np.testing.assert_allclose(
        np.asarray(jnp.sum(jnp.exp(out), axis=-1)), 1.0, rtol=1e-5)


def test_segmentation_model_end_to_end():
    model = zoo.SegmentationModel(
        arch_encoder="resnet18dilated", arch_decoder="ppm_deepsup"
    )
    out = _init_apply(model, X32, train=True)
    assert isinstance(out, tuple)
    assert out[0].shape == (1, 4, 4, 1)
    ev = _init_apply(model, X32, train=False)
    assert ev.shape == (1, 4, 4, 1)


def test_param_groups_named_for_optimizer():
    """The two-group SGD splits on 'encoder'/'decoder' path components
    (train_state.make_optimizer) — the zoo model must expose both."""
    model = zoo.SegmentationModel(
        arch_encoder="resnet18", arch_decoder="c1"
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, X32, train=False
    )
    assert set(variables["params"].keys()) == {"encoder", "decoder"}


def test_builder_rejects_unknown():
    with pytest.raises(ValueError):
        zoo.build_encoder("vgg16")
    with pytest.raises(ValueError):
        zoo.build_decoder("fcn8s")
