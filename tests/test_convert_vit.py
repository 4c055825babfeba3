"""ViT-B/16 checkpoint conversion (utils/convert_weights.py::convert_vit_b16).

Differential: a standard (timm-layout) ViT state_dict executes through a
minimal torch ViT implementing the standard computation, and through our
Flax ViT after conversion — outputs must agree. Plus position-grid resize
behavior and the MODEL.WEIGHTS load path for a ViT-backbone detector.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from interactron_tpu.utils.convert_weights import convert_vit_b16  # noqa: E402

WIDTH, LAYERS, HEADS, PATCH = 768, 12, 12, 16


class _TorchViT(nn.Module):
    """timm-layout ViT-B/16 trunk (no cls token in the forward — our port
    uses the patch grid only, matching models/vit.py)."""

    def __init__(self, n_pos):
        super().__init__()
        self.proj = nn.Conv2d(3, WIDTH, PATCH, stride=PATCH)
        self.pos_embed = nn.Parameter(torch.randn(1, n_pos + 1, WIDTH) * 0.02)
        self.blocks = nn.ModuleList()
        for _ in range(LAYERS):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(WIDTH)
            blk.qkv = nn.Linear(WIDTH, 3 * WIDTH)
            blk.attn_proj = nn.Linear(WIDTH, WIDTH)
            blk.norm2 = nn.LayerNorm(WIDTH)
            blk.fc1 = nn.Linear(WIDTH, 4 * WIDTH)
            blk.fc2 = nn.Linear(4 * WIDTH, WIDTH)
            self.blocks.append(blk)
        self.norm = nn.LayerNorm(WIDTH)

    def forward(self, x):
        b = x.shape[0]
        x = self.proj(x).flatten(2).transpose(1, 2)  # (b, n, w)
        x = x + self.pos_embed[:, 1:]
        hd = WIDTH // HEADS
        for blk in self.blocks:
            h = blk.norm1(x)
            qkv = blk.qkv(h).reshape(b, -1, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = torch.softmax(q @ k.transpose(-2, -1) / hd**0.5, dim=-1)
            h = (a @ v).transpose(1, 2).reshape(b, -1, WIDTH)
            x = x + blk.attn_proj(h)
            x = x + blk.fc2(torch.nn.functional.gelu(blk.fc1(blk.norm2(x))))
        return self.norm(x)

    def timm_state_dict(self):
        sd = {
            "patch_embed.proj.weight": self.proj.weight.detach().numpy(),
            "patch_embed.proj.bias": self.proj.bias.detach().numpy(),
            "pos_embed": self.pos_embed.detach().numpy(),
            "cls_token": np.zeros((1, 1, WIDTH), np.float32),
            "norm.weight": self.norm.weight.detach().numpy(),
            "norm.bias": self.norm.bias.detach().numpy(),
        }
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}"
            sd[f"{p}.norm1.weight"] = blk.norm1.weight.detach().numpy()
            sd[f"{p}.norm1.bias"] = blk.norm1.bias.detach().numpy()
            sd[f"{p}.attn.qkv.weight"] = blk.qkv.weight.detach().numpy()
            sd[f"{p}.attn.qkv.bias"] = blk.qkv.bias.detach().numpy()
            sd[f"{p}.attn.proj.weight"] = blk.attn_proj.weight.detach().numpy()
            sd[f"{p}.attn.proj.bias"] = blk.attn_proj.bias.detach().numpy()
            sd[f"{p}.norm2.weight"] = blk.norm2.weight.detach().numpy()
            sd[f"{p}.norm2.bias"] = blk.norm2.bias.detach().numpy()
            sd[f"{p}.mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
            sd[f"{p}.mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
            sd[f"{p}.mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
            sd[f"{p}.mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
        return sd


def test_vit_conversion_forward_differential():
    """Same weights, same 64x64 input (4x4 grid, no pos resize) -> same
    features from the torch execution and our converted Flax ViT."""
    from interactron_tpu.models.vit import ViT

    torch.manual_seed(0)
    grid = 4
    tm = _TorchViT(n_pos=grid * grid).eval()
    sd = tm.timm_state_dict()

    params = convert_vit_b16(sd, grid=grid)
    img = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = tm(torch.tensor(img).permute(0, 3, 1, 2)).numpy().reshape(2, grid, grid, WIDTH)
    ours = ViT(dtype=jnp.float32).apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)


def test_vit_pos_embed_resize():
    """A 14x14(+cls) checkpoint grid resizes to the target grid; identical
    grids pass through bitwise."""
    rng = np.random.RandomState(2)
    sd = _TorchViT(n_pos=14 * 14).timm_state_dict()
    sd["pos_embed"] = rng.randn(1, 14 * 14 + 1, WIDTH).astype(np.float32)

    p19 = convert_vit_b16(sd, grid=19)
    assert p19["pos_embed"].shape == (361, WIDTH)
    p14 = convert_vit_b16(sd, grid=14)
    np.testing.assert_array_equal(p14["pos_embed"], sd["pos_embed"][0, 1:])


def test_vit_weights_load_path(tmp_path):
    """MODEL.WEIGHTS with a torch ViT checkpoint loads into a vit-backbone
    detector through load_pretrained (grid inferred from the init tree)."""
    from interactron_tpu.utils.checkpoint import load_pretrained
    from interactron_tpu.models.detr import DETR

    torch.manual_seed(3)
    tm = _TorchViT(n_pos=14 * 14)
    wpath = str(tmp_path / "vit_b16.pth")
    torch.save({"model": {k: torch.tensor(v) for k, v in tm.timm_state_dict().items()}}, wpath)

    det = DETR(num_classes=7, num_queries=6, d_model=32, num_heads=2,
               num_encoder_layers=1, num_decoder_layers=1, ff_dim=32,
               backbone="vit_b16")
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dvars = det.init({"params": jax.random.PRNGKey(0)}, dummy, deterministic=True)
    params = {"detector": dvars["params"]}
    frozen = {"detector": dvars.get("frozen", {})}

    new_params, new_frozen = load_pretrained(wpath, params, frozen)
    got = np.asarray(new_params["detector"]["backbone"]["block0"]["mlp_fc"]["kernel"])
    want = tm.blocks[0].fc1.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=1e-6)
    # pos grid resized 14 -> 4 (64/16)
    assert new_params["detector"]["backbone"]["pos_embed"].shape[0] == 16
