"""Fusion ("supervisor") transformers: read per-frame DETR features and
predictions across an episode, emit refined boxes/logits, a learned-loss
token per prediction, and action logits.

Two variants, matching the reference:

  * `FusionGPT` — self-attention over the full token sequence
    [s*361 img | s*50 pred | 5 action] (= 2060 at s=5), minGPT-style blocks
    with FULL bidirectional attention (the reference's "CausalSelfAttention"
    registers an all-ones mask — gpt.py:35-36), learnable zero-init sequence
    position embedding (gpt.py:92; init_pos_emb is never called on this
    path). Used by `interactron` and `detr_multiframe`
    (models/transformer.py:33-66).

  * `FusionXAttn` — cross-attention decoder: 255 query tokens (250 pred + 5
    action) attend over 1805 zero-padded img tokens with fixed sincos
    positions and a learnable query embedding. Used by `interactron_random`
    (models/new_transformer.py:10-73).

Both decode per-pred-token boxes (sigmoid), logits, a scalar loss token, and
4 action logits from the first 4 action tokens.
"""

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from interactron_tpu.models.detr import TransformerDecoderStack
from interactron_tpu.models.layers import (
    Dense,
    Dropout,
    LayerNorm,
    MLP,
    MultiHeadAttention,
    normal02,
)
from interactron_tpu.models.position_encoding import sincos_1d, sincos_2d
from interactron_tpu.utils import constants as C


def _embed_inputs(x, embed_dim, dtype):
    """Shared input embedding (transformer.py:49-51 / new_transformer.py:36-38):
    img tokens from encoder memory, pred tokens from
    cat(box_features, pred_logits, pred_boxes)."""
    img = Dense(embed_dim, dtype=dtype, name="img_feature_embedding")(
        x["embedded_memory_features"]
    )  # (b, s, 361, E)
    preds = jnp.concatenate(
        [
            x["box_features"].astype(dtype),
            x["pred_logits"].astype(dtype),
            x["pred_boxes"].astype(dtype),
        ],
        axis=-1,
    )
    pred_emb = Dense(embed_dim, dtype=dtype, name="prediction_embedding")(preds)  # (b, s, 50, E)
    return img, pred_emb


def _kaiming_uniform_3d(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) on a (1, 5, E) tensor -> bound
    1/sqrt(fan_in) with fan_in = shape[1] * shape[2] (transformer.py:44-45)."""
    import jax

    fan_in = shape[-2] * shape[-1]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class GPTBlock(nn.Module):
    embed_dim: int
    num_heads: int
    attn_pdrop: float
    resid_pdrop: float
    dtype: Any

    @nn.compact
    def __call__(self, x, deterministic=True, q_len=None):
        """q_len: restrict QUERIES to the last q_len tokens (keys/values stay
        full) and return only those rows. Exact for the final block: the
        decode heads read only the last n_preds+5 positions
        (transformer.py:59-66), so the 5*361 img-token outputs of the last
        layer are dead — skipping their queries removes ~87% of that
        layer's attention and MLP work with bit-identical head inputs."""
        h = LayerNorm(name="ln1")(x)
        q_in = h if q_len is None else h[:, -q_len:]
        h = MultiHeadAttention(
            self.embed_dim,
            self.num_heads,
            self.attn_pdrop,
            dtype=self.dtype,
            kernel_init=normal02,
            name="attn",
        )(q_in, h, h, deterministic=deterministic)
        x = (x if q_len is None else x[:, -q_len:]) + Dropout(self.resid_pdrop)(h, deterministic)
        h = LayerNorm(name="ln2")(x)
        h = Dense(4 * self.embed_dim, dtype=self.dtype, kernel_init=normal02, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = Dense(self.embed_dim, dtype=self.dtype, kernel_init=normal02, name="mlp_proj")(h)
        x = x + Dropout(self.resid_pdrop)(h, deterministic)
        return x


class DecodeHeads(nn.Module):
    """The 4 decode heads shared by both fusion variants
    (transformer.py:40-43, new_transformer.py:16-19)."""

    num_classes: int
    output_size: int
    box_hidden: int  # 256 for the GPT variant, 512 for the xattn variant
    dtype: Any

    @nn.compact
    def __call__(self, y_preds, y_actions):
        boxes = nn.sigmoid(
            MLP(self.box_hidden, 4, 3, dtype=self.dtype, name="box_decoder")(y_preds).astype(
                jnp.float32
            )
        )
        logits = Dense(self.num_classes + 1, dtype=self.dtype, name="logit_decoder")(y_preds)
        loss = MLP(512, 1, 3, dtype=self.dtype, name="loss_decoder")(y_preds)
        actions = MLP(512, C.NUM_ACTIONS, 3, dtype=self.dtype, name="action_decoder")(y_actions)
        return {
            "pred_boxes": boxes,
            "pred_logits": logits.astype(jnp.float32),
            "loss": loss.astype(jnp.float32),
            "actions": actions.astype(jnp.float32),
        }


class FusionGPT(nn.Module):
    num_classes: int = C.NUM_CLASSES
    embed_dim: int = 512
    output_size: int = 512
    num_layers: int = 4
    num_heads: int = 8
    block_size: int = 2060
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        img, pred_emb = _embed_inputs(x, self.embed_dim, self.dtype)
        b, s, p, e = pred_emb.shape
        n_preds = s * p
        action_tokens = self.param(
            "action_tokens", _kaiming_uniform_3d, (1, C.NUM_FRAMES, self.embed_dim)
        )
        seq = jnp.concatenate(
            [
                img.reshape(b, -1, e),
                pred_emb.reshape(b, -1, e),
                jnp.broadcast_to(action_tokens.astype(self.dtype), (b, C.NUM_FRAMES, e)),
            ],
            axis=1,
        )
        t = seq.shape[1]
        assert t <= self.block_size, "block size exhausted"
        pos = self.param(
            "seq_pos_embed", nn.initializers.zeros, (self.block_size, self.embed_dim)
        )
        h = seq + pos[None, :t].astype(self.dtype)
        h = Dropout(self.embd_pdrop)(h, deterministic)
        out_len = n_preds + C.NUM_FRAMES  # the only positions the heads read
        Blk = nn.remat(GPTBlock, static_argnums=(2, 3)) if self.remat else GPTBlock
        for i in range(self.num_layers):
            h = Blk(
                self.embed_dim,
                self.num_heads,
                self.attn_pdrop,
                self.resid_pdrop,
                self.dtype,
                name=f"block{i}",
            )(h, deterministic, out_len if i == self.num_layers - 1 else None)
        h = LayerNorm(name="ln_f")(h)
        y = Dense(
            self.output_size, use_bias=False, dtype=self.dtype, kernel_init=normal02, name="head"
        )(h)

        y_preds = y[:, -(n_preds + C.NUM_FRAMES) : -C.NUM_FRAMES].reshape(b, s, p, -1)
        y_actions = y[:, -C.NUM_FRAMES : -1].reshape(b, C.NUM_ACTIONS, -1)
        return DecodeHeads(
            self.num_classes, self.output_size, 256, self.dtype, name="heads"
        )(y_preds, y_actions)


class FusionXAttn(nn.Module):
    num_classes: int = C.NUM_CLASSES
    embed_dim: int = 512
    output_size: int = 512
    num_layers: int = 4
    num_heads: int = 8
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        img, pred_emb = _embed_inputs(x, self.embed_dim, self.dtype)
        b, s, p, e = pred_emb.shape
        img_len = x["embedded_memory_features"].shape[2]
        mem_len = C.NUM_FRAMES * img_len
        tgt_len = C.NUM_FRAMES * p + C.NUM_FRAMES  # 255 at p=50

        action_tokens = self.param(
            "action_tokens", _kaiming_uniform_3d, (1, C.NUM_FRAMES, self.embed_dim)
        )

        memory = jnp.zeros((b, mem_len, e), self.dtype)
        memory = memory.at[:, : s * img_len].set(img.reshape(b, -1, e))
        tgt = jnp.zeros((b, tgt_len, e), self.dtype)
        tgt = tgt.at[:, : s * p].set(pred_emb.reshape(b, -1, e))
        tgt = tgt.at[:, tgt_len - C.NUM_FRAMES :].set(
            jnp.broadcast_to(action_tokens.astype(self.dtype), (b, C.NUM_FRAMES, e))
        )

        # fixed sincos memory positions (new_transformer.py:60-73)
        grid = int(round(img_len ** 0.5))
        pos = np.zeros((mem_len, self.embed_dim), np.float32)
        img_pos = np.zeros((img_len, self.embed_dim), np.float32)
        img_pos[:, : self.embed_dim // 2] = sincos_2d(self.embed_dim // 2, grid)
        seq_pos = np.zeros((C.NUM_FRAMES, self.embed_dim), np.float32)
        seq_pos[:, self.embed_dim // 2 :] = sincos_1d(self.embed_dim // 2, np.arange(C.NUM_FRAMES))
        for i in range(C.NUM_FRAMES):
            pos[i * img_len : (i + 1) * img_len] = img_pos + seq_pos[i]
        pos = jnp.asarray(pos, self.dtype)[None]

        query_embed = self.param(
            "query_embed", nn.initializers.zeros, (tgt_len, self.embed_dim)
        )
        y = TransformerDecoderStack(
            self.embed_dim,
            self.num_heads,
            self.num_layers,
            2048,
            self.dropout_rate,
            self.dtype,
            remat=self.remat,
            name="transformer",
        )(
            tgt,
            memory,
            jnp.broadcast_to(query_embed.astype(self.dtype)[None], (b, tgt_len, e)),
            pos,
            deterministic=deterministic,
        )

        assert s == C.NUM_FRAMES, "cross-attention fusion expects full episodes (s=5)"
        y_preds = y[:, : -C.NUM_FRAMES].reshape(b, s, p, -1)
        y_actions = y[:, -C.NUM_FRAMES : -1].reshape(b, C.NUM_ACTIONS, -1)
        return DecodeHeads(
            self.num_classes, self.output_size, 512, self.dtype, name="heads"
        )(y_preds, y_actions)


def build_fusion(config, dtype=jnp.float32):
    """Build the fusion variant for a model TYPE (config_utils dispatch)."""
    m = config.MODEL
    kwargs = dict(
        num_classes=m.NUM_CLASSES,
        embed_dim=m.EMBEDDING_DIM,
        output_size=m.OUTPUT_SIZE,
        num_layers=m.NUM_LAYERS,
        num_heads=m.NUM_HEADS,
        dtype=dtype,
    )
    if m.TYPE == "interactron_random":
        return FusionXAttn(dropout_rate=m.get("RESIDUAL_PDROP", 0.1), **kwargs)
    return FusionGPT(
        block_size=m.BLOCK_SIZE,
        embd_pdrop=m.get("EMBEDDING_PDROP", 0.1),
        attn_pdrop=m.get("ATTENTION_PDROP", 0.1),
        resid_pdrop=m.get("RESIDUAL_PDROP", 0.1),
        **kwargs,
    )
