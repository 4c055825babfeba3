"""Full fusion-transformer parity: torch re-expression of the reference
fusion (models/transformer.py:33-66 + models/gpt.py:13-200) with random
weights converted through convert_fusion_gpt must match FusionGPT outputs."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from interactron_tpu.models.fusion import FusionGPT
from tools.convert_weights import convert_fusion_gpt

NUM_CLASSES = 7
EMB = 32
NHEAD = 4
NLAYER = 2
NQ = 6
IMG_LEN = 4  # 2x2 feature map
BLOCK = 5 * (IMG_LEN + NQ) + 5
D_MODEL = 16  # detector feature size


class Attn(tnn.Module):
    def __init__(self):
        super().__init__()
        self.key = tnn.Linear(EMB, EMB)
        self.query = tnn.Linear(EMB, EMB)
        self.value = tnn.Linear(EMB, EMB)
        self.proj = tnn.Linear(EMB, EMB)

    def forward(self, x):
        B, T, C = x.shape
        k = self.key(x).view(B, T, NHEAD, C // NHEAD).transpose(1, 2)
        q = self.query(x).view(B, T, NHEAD, C // NHEAD).transpose(1, 2)
        v = self.value(x).view(B, T, NHEAD, C // NHEAD).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / math.sqrt(k.size(-1))
        att = tF.softmax(att, dim=-1)  # full bidirectional (gpt.py:35-36)
        y = (att @ v).transpose(1, 2).contiguous().view(B, T, C)
        return self.proj(y)


class Block(tnn.Module):
    def __init__(self):
        super().__init__()
        self.ln1 = tnn.LayerNorm(EMB)
        self.ln2 = tnn.LayerNorm(EMB)
        self.attn = Attn()
        self.mlp = tnn.Sequential(tnn.Linear(EMB, 4 * EMB), tnn.GELU(), tnn.Linear(4 * EMB, EMB))

    def forward(self, x):
        x = x + self.attn(self.ln1(x))
        x = x + self.mlp(self.ln2(x))
        return x


def mlp3(dims):
    return tnn.ModuleList([tnn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])])


def run_mlp3(layers, x):
    x = tF.relu(layers[0](x))
    x = tF.relu(layers[1](x))
    return layers[2](x)


class TorchFusion(tnn.Module):
    def __init__(self):
        super().__init__()
        self.img_feature_embedding = tnn.Linear(D_MODEL, EMB)
        self.prediction_embedding = tnn.Linear(D_MODEL + NUM_CLASSES + 5, EMB)
        self.action_tokens = tnn.Parameter(torch.randn(1, 5, EMB) * 0.02)
        self.seq_pos_embed = tnn.Parameter(torch.randn(1, BLOCK, EMB) * 0.02)
        self.blocks = tnn.ModuleList([Block() for _ in range(NLAYER)])
        self.ln_f = tnn.LayerNorm(EMB)
        self.head = tnn.Linear(EMB, EMB, bias=False)
        self.box_decoder = mlp3([EMB, 256, 256, 4])
        self.logit_decoder = tnn.Linear(EMB, NUM_CLASSES + 1)
        self.loss_decoder = mlp3([EMB, 512, 512, 1])
        self.action_decoder = mlp3([EMB, 512, 512, 4])

    def forward(self, mem, box_feats, logits, boxes):
        # mem: (1, s, L, D_MODEL); preds cat -> (1, s, Q, .)
        img = self.img_feature_embedding(mem)
        preds = torch.cat((box_feats, logits, boxes), dim=-1)
        pe = self.prediction_embedding(preds)
        b, s, p, n = pe.shape
        seq = torch.cat(
            (img.reshape(b, -1, n), pe.reshape(b, -1, n), self.action_tokens.repeat(b, 1, 1)),
            dim=1,
        )
        t = seq.shape[1]
        x = seq + self.seq_pos_embed[:, :t]
        for blk in self.blocks:
            x = blk(x)
        y = self.head(self.ln_f(x))
        n_preds = s * p
        y_preds = y[:, -(n_preds + 5):-5].reshape(b, s, p, -1)
        out_boxes = run_mlp3(self.box_decoder, y_preds).sigmoid()
        out_logits = self.logit_decoder(y_preds)
        out_loss = run_mlp3(self.loss_decoder, y_preds)
        out_actions = run_mlp3(self.action_decoder, y[:, -5:-1])
        return out_boxes, out_logits, out_loss, out_actions


def _reference_layout(m):
    sd = {}
    for k, v in m.state_dict().items():
        nk = k
        if k.startswith("blocks."):
            rest = k.split(".", 1)[1]
            i, tail = rest.split(".", 1)
            tail = tail.replace("mlp.0", "mlp#0").replace("mlp.2", "mlp#2")
            tail = tail.replace("#", ".")
            nk = f"model.blocks.{i}.{tail}"
        elif k in ("seq_pos_embed",):
            nk = "model.seq_pos_embed"
        elif k.startswith("ln_f.") or k.startswith("head."):
            nk = "model." + k
        elif any(k.startswith(h) for h in ("box_decoder.", "loss_decoder.", "action_decoder.")):
            head, i, tail = k.split(".")
            nk = f"{head}.layers.{i}.{tail}"
        sd[nk] = v.detach().numpy()
    return sd


def test_fusion_gpt_full_parity():
    torch.manual_seed(0)
    m = TorchFusion().eval()
    s = 5
    mem = torch.randn(1, s, IMG_LEN, D_MODEL) * 0.5
    bf = torch.randn(1, s, NQ, D_MODEL) * 0.5
    lg = torch.randn(1, s, NQ, NUM_CLASSES + 1) * 0.5
    bx = torch.rand(1, s, NQ, 4)
    with torch.no_grad():
        tb, tl, tloss, ta = m(mem, bf, lg, bx)

    params = convert_fusion_gpt(_reference_layout(m), num_layers=NLAYER)
    fusion = FusionGPT(
        num_classes=NUM_CLASSES, embed_dim=EMB, output_size=EMB, num_layers=NLAYER,
        num_heads=NHEAD, block_size=BLOCK, dtype=jnp.float32,
    )
    x = {
        "embedded_memory_features": jnp.asarray(mem.numpy()),
        "box_features": jnp.asarray(bf.numpy()),
        "pred_logits": jnp.asarray(lg.numpy()),
        "pred_boxes": jnp.asarray(bx.numpy()),
    }
    out = fusion.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["pred_boxes"]), tb.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]), tl.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["loss"]), tloss.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["actions"])[0], ta.numpy()[0], atol=3e-5)
