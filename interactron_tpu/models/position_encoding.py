"""Positional encodings.

`sine_position_embedding` reproduces the reference PositionEmbeddingSine with
normalize=True on an unpadded (all-valid) mask (detr_models/
position_encoding.py:28-48): with no padding the cumsums are just row/column
indices + 1, so the embedding is a compile-time constant for the fixed 19x19
grid — computed once in numpy instead of per-forward on device.

The 1D/2D sincos embeddings match the fusion transformers' init
(gpt.py:204-256, new_transformer.py:60-73).
"""

import numpy as np


def sine_position_embedding(h, w, num_pos_feats=128, temperature=10000.0):
    """Returns (h*w, 2*num_pos_feats) float32, flattened row-major (y, x) to
    match `flatten(2)` of an NCHW map in the reference."""
    scale = 2 * np.pi
    eps = 1e-6
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    # interleave sin on even dims, cos on odd dims
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2)  # (h, w, 2*num_pos_feats)
    return pos.reshape(h * w, -1).astype(np.float32)


def sincos_1d(embed_dim, positions):
    """(M,) positions -> (M, embed_dim): [sin(p*w) | cos(p*w)]
    (gpt.py:238-256)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = np.asarray(positions, np.float64).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def sincos_2d(embed_dim, grid_size):
    """(grid_size^2, embed_dim) 2D sincos grid, w-major like the reference
    meshgrid (gpt.py:204-230)."""
    assert embed_dim % 2 == 0
    g = np.arange(grid_size, dtype=np.float32)
    gw, gh = np.meshgrid(g, g)  # w goes first in the reference
    emb_h = sincos_1d(embed_dim // 2, gw.reshape(-1))
    emb_w = sincos_1d(embed_dim // 2, gh.reshape(-1))
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)
