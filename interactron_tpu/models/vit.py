"""ViT-B/16 backbone for the "Interactron-scaled" configuration
(BASELINE.json configs[4]): same stride-16 feature-map contract as
ResNet-50-DC5, so DETR and both fusion transformers compose unchanged.

Pre-LN ViT: 16x16 patch embed, learned position embeddings, GELU MLP; the
attention core is the shared fp32-softmax MHA (Pallas-fused when the gate
applies). Fully trainable (nothing frozen — the scaled config trains from
scratch), so the meta inner loop adapts the whole backbone.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from interactron_tpu.models.layers import (
    Dense,
    Dropout,
    LayerNorm,
    MultiHeadAttention,
    normal02,
)


class ViTBlock(nn.Module):
    width: int
    num_heads: int
    dropout_rate: float
    dtype: Any

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = LayerNorm(name="ln1")(x)
        h = MultiHeadAttention(
            self.width, self.num_heads, self.dropout_rate, dtype=self.dtype, name="attn"
        )(h, h, h, deterministic=deterministic)
        x = x + Dropout(self.dropout_rate)(h, deterministic)
        h = LayerNorm(name="ln2")(x)
        h = Dense(4 * self.width, dtype=self.dtype, kernel_init=normal02, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = Dense(self.width, dtype=self.dtype, kernel_init=normal02, name="mlp_proj")(h)
        return x + Dropout(self.dropout_rate)(h, deterministic)


class ViT(nn.Module):
    width: int = 768
    num_layers: int = 12
    num_heads: int = 12
    patch: int = 16
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic=True):
        b, hh, ww, _ = images.shape
        gh, gw = hh // self.patch, ww // self.patch
        x = images[:, : gh * self.patch, : gw * self.patch]
        # patchify as a reshape + dense (equivalent to a stride-16 conv,
        # lowers to one large MXU-friendly GEMM)
        x = x.reshape(b, gh, self.patch, gw, self.patch, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, self.patch * self.patch * 3)
        x = Dense(self.width, dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        pos = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02), (gh * gw, self.width)
        )
        x = x + pos[None].astype(self.dtype)
        for i in range(self.num_layers):
            x = ViTBlock(
                self.width, self.num_heads, self.dropout_rate, self.dtype, name=f"block{i}"
            )(x, deterministic=deterministic)
        x = LayerNorm(name="ln_f")(x)
        return x.reshape(b, gh, gw, self.width)
