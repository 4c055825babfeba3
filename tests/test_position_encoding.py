"""Sine position embedding vs a literal torch re-expression of the
reference PositionEmbeddingSine (detr_models/position_encoding.py:28-48,
normalize=True, all-valid mask) — catches interleaving/axis-order bugs that
would silently break pretrained-weight parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from interactron_tpu.models.position_encoding import sine_position_embedding


def torch_sine(h, w, num_pos_feats=128, temperature=10000):
    import math

    mask = torch.zeros((1, h, w), dtype=torch.bool)
    not_mask = ~mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (torch.div(dim_t, 2, rounding_mode="floor")) / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)  # (1, 256, h, w)
    # reference flattens NCHW spatially: (c, h*w) -> tokens (h*w, c)
    return pos[0].flatten(1).T.numpy()


@pytest.mark.parametrize("h,w", [(19, 19), (5, 7)])
def test_sine_position_embedding_matches_torch(h, w):
    ours = sine_position_embedding(h, w, 128)
    theirs = torch_sine(h, w, 128)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
