"""Pretrained-weight wiring end to end (VERDICT round-1 missing item #1):

1. MODEL.WEIGHTS consumption: a torch checkpoint in the reference layout is
   converted on the fly at task init (reference loads detr-dc5-backbone.pth
   at model construction, models/interactron.py:23).
2. The frozen collection (stem+layer1 kernels, all BN stats) round-trips
   through trainer checkpoints, so a fresh process reproduces a trained
   model's predictions bit-for-bit.
"""

import os

import numpy as np
import jax
import pytest

from tests.tiny_config import tiny_config, IMG, NUM_CLASSES
from interactron_tpu.data.synthetic import make_synthetic_dataset
from interactron_tpu.utils.config import Config, build_evaluator, build_model, build_trainer

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("syndata"))
    img_root, ann = make_synthetic_dataset(root, n_episodes=3, n_states=6,
                                           img_size=IMG, n_categories=NUM_CLASSES - 1)
    return img_root, ann


def test_model_weights_loaded_at_init(tmp_path):
    """task.init must consume MODEL.WEIGHTS (torch .pt, reference layout)."""
    from tests.test_detr_full_parity import (
        TorchDETR,
        _torch_state_dict_in_reference_layout,
    )
    from interactron_tpu.tasks import DETRTask

    torch.manual_seed(3)
    sd = _torch_state_dict_in_reference_layout(TorchDETR().eval())
    ckpt = str(tmp_path / "detr-dc5-backbone.pth")
    torch.save({"model": sd}, ckpt)

    cfg = Config(
        {
            "MODEL": {
                "TYPE": "detr",
                "NUM_CLASSES": 7,  # TorchDETR's NUM_CLASSES
                "BACKBONE": "resnet50",
                "TEST_RESOLUTION": 64,
                "NUM_QUERIES": 50,
                "WEIGHTS": ckpt,
            },
        }
    )
    task = DETRTask(cfg)
    params, frozen = task.init(jax.random.PRNGKey(0))

    det = params["detector"]
    np.testing.assert_array_equal(
        np.asarray(det["class_embed"]["kernel"]), sd["class_embed.weight"].T
    )
    np.testing.assert_array_equal(
        np.asarray(det["query_embed"]), sd["query_embed.weight"]
    )
    fb = frozen["detector"]["backbone"]
    np.testing.assert_array_equal(
        np.asarray(fb["bn1"]["running_mean"]), sd["backbone.0.body.bn1.running_mean"]
    )
    np.testing.assert_array_equal(
        np.asarray(fb["conv1"]["kernel"]),
        sd["backbone.0.body.conv1.weight"].transpose(2, 3, 1, 0),
    )
    # layer2's conv kernels are trainable; its BN stats live in frozen
    assert "layer2_block0" in det["backbone"]
    assert "bn1" in fb["layer2_block0"]


def test_frozen_roundtrip_through_checkpoint(synth, tmp_path):
    """Train -> save -> fresh-process-style evaluator load must reproduce
    predictions exactly, including the frozen collection."""
    img_root, ann = synth
    cfg = tiny_config("detr")
    cfg.DATASET = Config({
        "TRAIN": {"TYPE": "sequence", "MODE": "train", "ANNOTATION_ROOT": ann, "IMAGE_ROOT": img_root},
        "TEST": {"TYPE": "sequence", "MODE": "test", "ANNOTATION_ROOT": ann, "IMAGE_ROOT": img_root},
    })
    cfg.TRAINER.TYPE = "direct_supervision"
    cfg.TRAINER.LR = 1e-4
    cfg.TRAINER.BATCH_SIZE = 3
    cfg.TRAINER.OUTPUT_DIRECTORY = str(tmp_path / "out")

    model = build_model(cfg)
    trainer = build_trainer(model, cfg, evaluator=None)
    # non-default rng: the trained frozen collection differs from what a
    # fresh PRNGKey(42) init would produce, so the load is load-bearing
    params, frozen = trainer.train(max_epochs=2, rng=jax.random.PRNGKey(7))

    from interactron_tpu.data.episode_dataset import EpisodeDataset, EpisodeLoader

    ds = EpisodeDataset(img_root, ann, "test", resolution=model.img_size,
                        max_boxes=model.max_boxes)
    batch = next(iter(EpisodeLoader(ds, batch_size=1, shuffle=False)))
    db = {k: v for k, v in batch.items() if k != "initial_image_path"}
    want = jax.device_get(model.predict(params, frozen, db))

    # fresh model + evaluator, params only via the saved checkpoint
    cfg.EVALUATOR.CHECKPOINT = trainer.checkpoint_path
    model2 = build_model(cfg)
    ev = build_evaluator(model2, cfg, load_checkpoint=True)
    ev.ensure_params()
    got = jax.device_get(model2.predict(ev.params, ev.frozen, db))

    np.testing.assert_array_equal(want["pred_logits"], got["pred_logits"])
    np.testing.assert_array_equal(want["pred_boxes"], got["pred_boxes"])

    # resume path restores frozen too
    last = os.path.join(trainer.out_dir, "last_state.ckpt")
    assert os.path.exists(last)
    from interactron_tpu.utils.checkpoint import load_pytree

    p0, f0, o0, ps0 = trainer.init_state(jax.random.PRNGKey(0))
    state = load_pytree(
        last,
        {"params": p0, "frozen": f0, "opt": o0, "epoch": 0, "tokens": 0,
         "path_state": ps0},
    )
    fb_saved = state["frozen"]
    chk = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            fb_saved, jax.device_get(frozen),
        )
    )
    assert chk, "frozen collection did not round-trip through last_state.ckpt"
