"""End-to-end slice on the synthetic fixture: dataset -> loader -> task ->
evaluator AP, and a 2-epoch trainer run on the tiny config."""

import os

import numpy as np
import jax
import pytest

from tests.tiny_config import tiny_config, IMG, NUM_CLASSES
from interactron_tpu.data.episode_dataset import EpisodeDataset, EpisodeLoader, InteractiveEpisodeDataset
from interactron_tpu.data.synthetic import make_synthetic_dataset
from interactron_tpu.utils.config import build_evaluator, build_model, build_trainer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("syndata"))
    img_root, ann = make_synthetic_dataset(root, n_episodes=3, n_states=6,
                                           img_size=IMG, n_categories=NUM_CLASSES - 1)
    return img_root, ann


def _cfg(synth, model_type="detr", trainer_type=None, evaluator="random_policy_evaluator"):
    img_root, ann = synth
    cfg = tiny_config(model_type)
    d = {
        "TRAIN": {"TYPE": "sequence", "MODE": "train", "ANNOTATION_ROOT": ann, "IMAGE_ROOT": img_root},
        "TEST": {"TYPE": "sequence", "MODE": "test", "ANNOTATION_ROOT": ann, "IMAGE_ROOT": img_root},
    }
    from interactron_tpu.utils.config import Config

    cfg.DATASET = Config(d)
    cfg.TRAINER.TYPE = trainer_type or (
        "direct_supervision" if model_type in ("detr", "detr_multiframe") else model_type
    )
    cfg.TRAINER.LR = 1e-4
    cfg.EVALUATOR.TYPE = evaluator
    return cfg


def test_dataset_shapes(synth):
    img_root, ann = synth
    ds = EpisodeDataset(img_root, ann, "test", resolution=IMG)
    s = ds.get_item(0)
    assert s["frames"].shape == (5, IMG, IMG, 3)
    assert s["boxes"].shape[-1] == 4 and s["valid"].any()
    assert 0.0 <= s["boxes"][s["valid"]].min() and s["boxes"][s["valid"]].max() <= 1.0
    loader = EpisodeLoader(ds, batch_size=2, shuffle=True, num_workers=1)
    batch = next(iter(loader))
    assert batch["frames"].shape == (2, 5, IMG, IMG, 3)
    assert len(batch["initial_image_path"]) == 2

    # train aug keeps boxes normalized
    ds_tr = EpisodeDataset(img_root, ann, "train", train_aug=True, resolution=IMG)
    st = ds_tr.get_item(1)
    if st["valid"].any():
        assert st["boxes"][st["valid"]].max() <= 1.0 + 1e-6


def test_interactive_dataset(synth):
    img_root, ann = synth
    ds = InteractiveEpisodeDataset(img_root, ann, "test", resolution=IMG)
    b = ds.reset()
    assert b["frames"].shape == (1, 1, IMG, IMG, 3)
    b = ds.step(2)
    assert b["frames"].shape == (1, 2, IMG, IMG, 3)
    assert list(b["actions"][0]) == [2]


def test_random_policy_evaluator_end_to_end(synth):
    cfg = _cfg(synth, "detr")
    model = build_model(cfg)
    ev = build_evaluator(model, cfg, load_checkpoint=False)
    ap50, ap, tp, fp, fn = ev.evaluate(save_results=False)
    assert 0.0 <= ap50 <= 1.0 and 0.0 <= ap <= 1.0
    assert tp + fp + fn > 0


def test_trainer_two_epochs(synth):
    cfg = _cfg(synth, "detr")
    cfg.TRAINER.BATCH_SIZE = 3
    model = build_model(cfg)
    trainer = build_trainer(model, cfg, evaluator=None)
    params, frozen = trainer.train(max_epochs=2)
    assert params is not None
    assert os.path.exists(trainer.checkpoint_path)


def test_interactive_evaluator_end_to_end(synth):
    cfg = _cfg(synth, "interactron", evaluator="interactive_evaluator")
    model = build_model(cfg)
    ev = build_evaluator(model, cfg, load_checkpoint=False)
    out = ev.evaluate(save_results=False)
    assert len(out) == 5


def test_interactive_lockstep_matches_serial(synth):
    """The batched lockstep rollout (VERDICT r3 next #3) must produce
    IDENTICAL detections to the serial reset/step path — same actions, same
    adaptive predictions, same records — and share the path across a padded
    tail chunk (3 episodes, rollout batch 2 -> one full + one padded chunk)."""
    cfg = _cfg(synth, "interactron", evaluator="interactive_evaluator")
    model = build_model(cfg)

    import jax as _jax

    params, frozen = model.init(_jax.random.PRNGKey(7))

    def run(rollout_batch):
        cfg.EVALUATOR.ROLLOUT_BATCH = rollout_batch
        ev = build_evaluator(model, cfg, load_checkpoint=False)
        records = []
        orig = ev._score_episode

        def capture(batch, preds):
            dets = orig(batch, preds)
            records.extend(dets)
            return dets

        ev._score_episode = capture
        out = ev.evaluate(save_results=False, params=params, frozen=frozen)
        return out, records

    serial_out, serial_recs = run(1)
    lock_out, lock_recs = run(2)

    assert len(serial_recs) == len(lock_recs)
    key = lambda d: (d["img"], d["type"], d["pred_cat"], d["pred_score"])
    for a, b in zip(sorted(serial_recs, key=key), sorted(lock_recs, key=key)):
        assert a["type"] == b["type"] and a["pred_cat"] == b["pred_cat"]
        assert a["img"] == b["img"]
        np.testing.assert_allclose(a["pred_score"], b["pred_score"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a["iou"], b["iou"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a["box"], b["box"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(serial_out[0], lock_out[0], atol=1e-6)
    np.testing.assert_allclose(serial_out[1], lock_out[1], atol=1e-6)
    assert serial_out[2:] == lock_out[2:]
