"""Optimizer construction helpers.

`weight_decay_mask` reproduces the reference's decay/no-decay partition
(models/gpt.py:144-187, models/transformer.py:68-106): Linear/conv kernels
decay; biases, LayerNorm scales/biases, embeddings, position embeddings and
token parameters do not. The reference defines this split but its shipped
trainers use plain Adam; exposed here for the AdamW config option
(TRAINER.OPTIM_TYPE: "AdamW" + WEIGHT_DECAY)."""

import jax
import optax

_NO_DECAY_NAMES = (
    "bias",
    "scale",  # our LayerNorm scale
    "seq_pos_embed",
    "pos_emb",
    "query_embed",
    "action_tokens",
)


def weight_decay_mask(params):
    def decide(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if any(n in _NO_DECAY_NAMES for n in names):
            return False
        return leaf.ndim >= 2  # kernels decay, everything else doesn't

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(kind, lr, weight_decay=0.0, params=None):
    """kind: "Adam" (reference default, torch betas 0.9/0.999) or "AdamW"
    with the decay mask above."""
    if kind.lower() == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr,
            weight_decay=weight_decay,
            mask=weight_decay_mask(params) if params is not None else None,
        )
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)
