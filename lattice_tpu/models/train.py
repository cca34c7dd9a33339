"""Contrastive fine-tuning of the UniXcoder encoder (training subsystem).

The reference has no training loop (it consumes a frozen checkpoint); a
production retrieval framework needs one to adapt the embedder to a private
codebase. This implements the standard bi-encoder recipe: InfoNCE over
(anchor, positive) pairs — e.g. (docstring/summary, code chunk) mined from
the index — with in-batch negatives, bidirectional cross-entropy, and a
learned temperature-free scale.

Parallelism: batch is sharded over the `data` mesh axis (dp) and the
encoder params over `model` (tp, Megatron-style rules in
`parallel/mesh.py`); XLA inserts the psum for gradients across `data` and
the tp all-reduces inside the encoder. This is the training step
`__graft_entry__.dryrun_multichip` compiles over an N-device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lattice_tpu.models.unixcoder import UniXcoderConfig, UniXcoderEncoder
from lattice_tpu.parallel.mesh import (
    DATA_AXIS,
    Mesh,
    NamedSharding,
    P,
    shard_params,
)


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_optimizer(learning_rate: float = 2e-5,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def contrastive_loss(params, module: UniXcoderEncoder, batch: dict,
                     scale: float = 20.0) -> jax.Array:
    """Bidirectional InfoNCE with in-batch negatives."""
    _, anchor = module.apply({"params": params},
                             batch["anchor_ids"], batch["anchor_mask"])
    _, positive = module.apply({"params": params},
                               batch["positive_ids"], batch["positive_mask"])
    anchor = anchor / jnp.maximum(
        jnp.linalg.norm(anchor, axis=-1, keepdims=True), 1e-6)
    positive = positive / jnp.maximum(
        jnp.linalg.norm(positive, axis=-1, keepdims=True), 1e-6)
    logits = scale * (anchor @ positive.T)          # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_p = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return (loss_a.mean() + loss_p.mean()) / 2.0


class ContrastiveTrainer:
    def __init__(self, config: UniXcoderConfig | None = None,
                 mesh: Mesh | None = None,
                 learning_rate: float = 2e-5, seed: int = 0,
                 remat: bool = True):
        # training defaults to per-layer rematerialization: the backward
        # pass recomputes each layer's activations instead of holding all
        # 12 [B, L, H] (+attention-prob) tensors — the FLOPs-for-HBM
        # trade that unlocks large in-batch-negative pools. Param tree is
        # unchanged, so checkpoints stay compatible either way.
        self.config = dataclasses.replace(config or UniXcoderConfig(),
                                          remat=remat)
        self.module = UniXcoderEncoder(self.config)
        self.mesh = mesh
        self.optimizer = make_optimizer(learning_rate)
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 8), dtype=jnp.int32)
        params = self.module.init(rng, dummy, jnp.ones_like(dummy))["params"]
        if mesh is not None:
            params = shard_params(params, mesh)
        self.state = TrainState(params=params,
                                opt_state=self.optimizer.init(params))
        self._step_fn = self._build_step()

    def _build_step(self):
        module = self.module
        optimizer = self.optimizer

        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(contrastive_loss)(
                params, module, batch)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if self.mesh is None:
            return jax.jit(step)
        batch_sharding = {
            "anchor_ids": NamedSharding(self.mesh, P(DATA_AXIS, None)),
            "anchor_mask": NamedSharding(self.mesh, P(DATA_AXIS, None)),
            "positive_ids": NamedSharding(self.mesh, P(DATA_AXIS, None)),
            "positive_mask": NamedSharding(self.mesh, P(DATA_AXIS, None)),
        }
        # params/opt_state keep their placement shardings; only constrain
        # the batch input and let GSPMD propagate the rest.
        return jax.jit(step, in_shardings=(None, None, batch_sharding))

    def shard_batch(self, batch: dict) -> dict:
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        out = {}
        for key, value in batch.items():
            out[key] = jax.device_put(
                jnp.asarray(value),
                NamedSharding(self.mesh, P(DATA_AXIS, None)))
        return out

    def train_step(self, batch: dict) -> float:
        batch = self.shard_batch(batch)
        params, opt_state, loss = self._step_fn(
            self.state.params, self.state.opt_state, batch)
        self.state = TrainState(params=params, opt_state=opt_state,
                                step=self.state.step + 1)
        return float(loss)


def make_dummy_batch(batch_size: int = 8, length: int = 32,
                     vocab_size: int = 1000, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, vocab_size, size=(batch_size, length))
    return {
        "anchor_ids": ids.astype(np.int32),
        "anchor_mask": np.ones((batch_size, length), dtype=np.int32),
        "positive_ids": (ids + 1).astype(np.int32) % vocab_size,
        "positive_mask": np.ones((batch_size, length), dtype=np.int32),
    }
