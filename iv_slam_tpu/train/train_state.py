"""Optimizer + train step for the introspection FCN.

Reproduces the reference recipe (training/train_modular.py):
  * two SGD groups (encoder / decoder) with independent base LRs
    (TRAIN.lr_encoder = TRAIN.lr_decoder = 0.02), momentum (beta1 = 0.9)
  * poly LR decay: lr = base * (1 - iter / max_iter)^0.9 (lr_pow)
  * weight decay 1e-4 on conv/linear weights only — BN scales and biases
    excluded (group_weight, train_modular.py:35-71)
  * masked MSE + 0.4x deep supervision (losses.py)

The step function is mesh-agnostic: jit it with shardings from
parallel/mesh.py for multi-chip data(+model) parallelism.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..models.introspection import IntrospectionNet
from .losses import deep_sup_loss, masked_mse


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def poly_schedule(base_lr: float, max_iters: int, power: float = 0.9):
    def fn(count):
        frac = jnp.clip(count / max_iters, 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power

    return fn


def _wd_mask(params):
    """Weight decay only on rank >= 2 kernels (group_weight semantics)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def make_optimizer(
    lr_encoder: float = 0.02,
    lr_decoder: float = 0.02,
    max_iters: int = 100_000,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    lr_pow: float = 0.9,
):
    def group_tx(base_lr):
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=_wd_mask),
            optax.sgd(poly_schedule(base_lr, max_iters, lr_pow), momentum),
        )

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: (
                "encoder" if any(
                    getattr(k, "key", None) == "encoder" for k in path
                ) else "decoder"
            ),
            params,
        )

    return optax.multi_transform(
        {"encoder": group_tx(lr_encoder), "decoder": group_tx(lr_decoder)},
        label_fn,
    )


def create_train_state(
    rng, net: IntrospectionNet, input_hw=(512, 512), tx=None
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = tx or make_optimizer()
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    variables = net.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        dummy, train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return (
        TrainState(params, batch_stats, tx.init(params), jnp.int32(0)),
        tx,
    )


def train_step(
    state: TrainState,
    batch,
    net: IntrospectionNet,
    tx: optax.GradientTransformation,
):
    """batch: dict(image (B,H,W,3) normalized float, target (B,h,w,1),
    mask (B,h,w,1)) with h = H/8 (target_downsampling_rate)."""

    def loss_fn(params):
        out, updates = net.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(
                jax.random.PRNGKey(0), state.step)},
        )
        if isinstance(out, tuple):
            # deep-supervision decoders return (pred, pred_deepsup)
            loss, main = deep_sup_loss(
                out[0], out[1], batch["target"], batch["mask"]
            )
        else:
            loss = main = masked_mse(out, batch["target"], batch["mask"])
        return loss, (main, updates["batch_stats"])

    (loss, (main, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        TrainState(new_params, new_bs, new_opt, state.step + 1),
        {"loss": loss, "mse": main},
    )


def make_jit_train_step(net, tx, mesh=None):
    step = functools.partial(train_step, net=net, tx=tx)
    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step,
        in_shardings=(None, data),
        out_shardings=None,
    )
