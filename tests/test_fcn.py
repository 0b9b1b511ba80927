import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv_slam_tpu.models.introspection import (
    IntrospectionNet, inference_cost_map, normalize_image,
)
from iv_slam_tpu.train import train_state as ts
from iv_slam_tpu.train.losses import masked_mse, deep_sup_loss


@pytest.fixture(scope="module")
def net_and_state():
    net = IntrospectionNet()
    tx = ts.make_optimizer(max_iters=100)
    state, tx = ts.create_train_state(
        jax.random.PRNGKey(0), net, input_hw=(64, 64), tx=tx
    )
    return net, state, tx


def test_fcn_output_shapes(net_and_state):
    net, state, _ = net_and_state
    x = jnp.zeros((2, 64, 64, 3))
    pred, ds = net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=True, mutable=["batch_stats"],
    )[0]
    # output stride 8 on both heads (dilated encoder taps)
    assert pred.shape == (2, 8, 8, 1)
    assert ds.shape == (2, 8, 8, 1)
    infer = net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False,
    )
    assert infer.shape == (2, 8, 8, 1)


def test_masked_mse():
    pred = jnp.ones((1, 4, 4, 1))
    tgt = jnp.zeros((1, 4, 4, 1))
    mask = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)
    assert float(masked_mse(pred, tgt, mask)) == pytest.approx(1.0)
    loss, main = deep_sup_loss(pred, pred * 0.5, tgt, mask)
    assert float(loss) == pytest.approx(1.0 + 0.4 * 0.25)


def test_train_step_reduces_loss(net_and_state):
    net, state, tx = net_and_state
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        "target": jnp.asarray(rng.uniform(size=(2, 8, 8, 1)).astype(np.float32)),
        "mask": jnp.ones((2, 8, 8, 1), jnp.float32),
    }
    step = ts.make_jit_train_step(net, tx)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_poly_schedule():
    sched = ts.poly_schedule(0.02, 100, 0.9)
    assert float(sched(0)) == pytest.approx(0.02)
    assert float(sched(100)) == pytest.approx(0.0)
    assert float(sched(50)) < 0.02


def test_inference_cost_map(net_and_state):
    net, state, _ = net_and_state
    img = np.random.default_rng(1).integers(
        0, 255, (96, 128, 3), dtype=np.uint8
    )
    cost = inference_cost_map(
        net, {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(img), out_hw=(96, 128), net_hw=(64, 64),
    )
    assert cost.shape == (96, 128)
    assert cost.dtype == jnp.uint8


def test_normalize_image():
    img = jnp.full((4, 4, 3), 255, jnp.uint8)
    x = np.asarray(normalize_image(img))
    np.testing.assert_allclose(
        x[0, 0], (1.0 - np.array([0.485, 0.456, 0.406]))
        / np.array([0.229, 0.224, 0.225]), rtol=1e-5,
    )


def test_frontend_fused_fcn(net_and_state):
    """attach_introspection fuses cost-map inference into the frontend
    program: one submit yields quality-seeded keypoints (qual != 1) with
    no host-side cost-map round-trip."""
    from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
    from iv_slam_tpu.slam.frame import StereoFrontend

    net, state, _ = net_and_state
    cfg = Config()
    cfg.camera = CameraConfig(fx=400, fy=400, cx=160, cy=120, bf=200,
                              width=320, height=240)
    cfg.orb = ORBConfig(n_features=400, n_levels=3)
    fe_ = StereoFrontend(cfg, 240, 320)
    fe_.attach_introspection(
        net, {"params": state.params, "batch_stats": state.batch_stats},
        net_hw=(64, 64),
    )
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (240, 320), dtype=np.uint8)
    frame = fe_.process(img, img, 0.0)
    q = frame.qual_score[frame.valid]
    assert len(q) > 50
    assert (q >= -1.0 - 1e-6).all() and (q <= 1.0 + 1e-6).all()

    # the fused path must match running the FCN separately and feeding the
    # cost map in explicitly (the reference's two-step flow)
    cost = np.asarray(inference_cost_map(
        net, {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(np.stack([img] * 3, axis=-1)), out_hw=(240, 320),
        net_hw=(64, 64),
    ))
    fe2 = StereoFrontend(cfg, 240, 320)
    frame2 = fe2.process(img, img, 0.0, cost_map=cost)
    np.testing.assert_array_equal(frame.xy, frame2.xy)
    np.testing.assert_allclose(
        frame.qual_score, frame2.qual_score, atol=1e-6
    )
