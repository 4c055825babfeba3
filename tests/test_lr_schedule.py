"""LR warmup+cosine schedule + token-unit parity (VERDICT r4 next #8).

The reference has TWO token-unit conventions and one ordering quirk:

  * interactron trainers count FRAMES: `tokens += b * s`
    (interactron_trainer.py:115); direct_supervision counts EPISODES:
    `tokens += frames.shape[0]` (direct_supervision_trainer.py:107);
  * both construct the optimizer at the FULL configured LR and only re-set
    the param-group lr AFTER each step (interactron_trainer.py:114-126,
    direct_supervision_trainer.py:105-118) — so iteration 0 always steps at
    scale 1.0 even inside warmup, and the schedule value computed after
    iteration i applies to iteration i+1.

Our Trainer computes `_lr_scale()` BEFORE each step from the running token
count and calls `_advance_tokens` after — the same sequence of effective LRs
iff `_lr_scale` returns 1.0 at tokens==0. This test drives 100 simulated
iterations (uneven tail batches included) through a real Trainer for both
trainer types against the reference's loop re-expressed verbatim, with
nonzero WARMUP_TOKENS / FINAL_TOKENS.
"""

import math

import numpy as np
import pytest

from tests.tiny_config import tiny_config, IMG, NUM_CLASSES


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from interactron_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path_factory.mktemp("lrsched"))
    return make_synthetic_dataset(
        root, n_episodes=2, n_states=4, img_size=IMG, n_categories=NUM_CLASSES - 1
    )


def _trainer(synth, trainer_type, model_type, warmup, final):
    from interactron_tpu.engine.trainer import Trainer
    from interactron_tpu.utils.config import Config, build_model

    img_root, ann = synth
    cfg = tiny_config(model_type)
    cfg.DATASET = Config(
        {
            "TRAIN": {"TYPE": "sequence", "MODE": "train", "ANNOTATION_ROOT": ann,
                      "IMAGE_ROOT": img_root},
            "TEST": {"TYPE": "sequence", "MODE": "test", "ANNOTATION_ROOT": ann,
                     "IMAGE_ROOT": img_root},
        }
    )
    cfg.TRAINER.TYPE = trainer_type
    cfg.TRAINER.LR_DECAY = True
    cfg.TRAINER.WARMUP_TOKENS = warmup
    cfg.TRAINER.FINAL_TOKENS = final
    cfg.TRAINER.LEARNING_RATE = 3e-4
    model = build_model(cfg)
    return Trainer(model, cfg, evaluator=None, mesh=None)


def _reference_lr_sequence(base_lr, batch_rows, seq_len, warmup, final, per_frame):
    """The reference loop, re-expressed: lr starts at base_lr (optimizer
    construction), each iteration STEPS at the current lr and then updates it
    from the post-increment token count (interactron_trainer.py:114-126)."""
    lrs, tokens, lr = [], 0, base_lr
    for rows in batch_rows:
        lrs.append(lr)  # the lr this iteration's optimizer.step() uses
        tokens += rows * seq_len if per_frame else rows
        if tokens < warmup:
            lr_mult = float(tokens) / float(max(1, warmup))
        else:
            progress = float(tokens - warmup) / float(max(1, final - warmup))
            lr_mult = max(0.1, 0.5 * (1.0 + math.cos(math.pi * progress)))
        lr = base_lr * lr_mult
    return lrs


def _our_lr_sequence(trainer, base_lr, batch_rows, seq_len):
    """run_epoch's schedule calls in order: scale before the step, token
    advance after (engine/trainer.py run_epoch)."""
    lrs = []
    for rows in batch_rows:
        lrs.append(base_lr * trainer._lr_scale())
        trainer._advance_tokens(rows, seq_len)
    return lrs


# 100 iterations: 97 full batches of 4 episodes + uneven tails of 3/2/1
BATCH_ROWS = [4] * 50 + [3] + [4] * 30 + [2] + [4] * 17 + [1]
S = 5


def test_interactron_schedule_counts_frames(synth):
    """Warmup crosses inside the run; cosine tail reaches the 0.1 floor."""
    tr = _trainer(synth, "interactron", "interactron", warmup=300, final=1500)
    base = tr.supervisor_lr
    ref = _reference_lr_sequence(base, BATCH_ROWS, S, 300, 1500, per_frame=True)
    ours = _our_lr_sequence(tr, base, BATCH_ROWS, S)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
    # the schedule actually moved through all three regimes
    assert ours[0] == base                       # iteration-0 full-LR quirk
    assert min(ours[1:10]) < 0.5 * base          # warmup engaged
    # cosine floor reached (warmup values may be lower; the 0.1 clamp is
    # cosine-branch-only in the reference)
    assert any(math.isclose(v, 0.1 * base) for v in ours)
    # token unit is FRAMES: 100 batches advanced rows*5 each
    assert tr.tokens == sum(BATCH_ROWS) * S


def test_direct_supervision_schedule_counts_episodes(synth):
    tr = _trainer(synth, "direct_supervision", "detr_multiframe",
                  warmup=60, final=300)
    base = tr.learning_rate
    ref = _reference_lr_sequence(base, BATCH_ROWS, S, 60, 300, per_frame=False)
    ours = _our_lr_sequence(tr, base, BATCH_ROWS, S)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
    assert tr.tokens == sum(BATCH_ROWS)  # EPISODES, not frames
    # episode counting walks the same schedule 5x slower than frame counting:
    # at iteration 15 (60 episodes) warmup just ends
    assert math.isclose(ours[16], base * 60 / 60, rel_tol=1e-9) or ours[16] <= base


def test_lr_decay_off_is_constant(synth):
    tr = _trainer(synth, "interactron", "interactron", warmup=300, final=1500)
    tr.lr_decay = False
    ours = _our_lr_sequence(tr, tr.supervisor_lr, BATCH_ROWS, S)
    assert all(v == tr.supervisor_lr for v in ours)
