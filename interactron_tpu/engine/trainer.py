"""Training loop (engine/*_trainer.py in the reference, unified).

One Trainer serves all four experiment rows; behavior keyed by TRAINER.TYPE:

  * interactron / interactron_random: two Adam optimizers — detector at
    DETECTOR_LR, fusion ("supervisor") at SUPERVISOR_LR
    (interactron_trainer.py:71-72; the interactron_random trainer hardcodes
    1e-5/1e-4 regardless of config — interactron_random_trainer.py:70-71,
    reproduced deliberately);
  * direct_supervision: one Adam over everything (direct_supervision_trainer.py:69).

Per iteration: grads accumulate over the episode batch inside the task (the
reference's backward-inside-forward), global grad-norm clip over ALL params
jointly (interactron_trainer.py:107), optimizer step(s), optional
warmup+cosine LR on the supervisor keyed to seen token count
(interactron_trainer.py:114-126). Epoch 0 and every epoch run a full test
epoch + AP evaluation (interactron_trainer.py:140-159); the final checkpoint
is the uniform weight average of the last SAVE_WINDOW epochs
(interactron_trainer.py:48-65). Adds what the reference lacks: full-state
resume and a mesh-sharded train step (episodes over 'dp').
"""

import math
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import optax

from interactron_tpu.data.episode_dataset import EpisodeDataset, EpisodeLoader
from interactron_tpu.parallel.mesh import data_parallel_grads, make_mesh, shard_batch
from interactron_tpu.utils.checkpoint import RunningAverage, save_pytree, load_pytree
from interactron_tpu.utils.logging import MetricLogger


def global_norm_clip(grads, max_norm):
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm


class Trainer:
    def __init__(self, model, config, evaluator=None, mesh=None):
        self.model = model
        self.config = config
        self.evaluator = evaluator
        t = config.TRAINER
        self.type = t.TYPE

        suffix = "" if jax.process_index() == 0 else f"-p{jax.process_index()}"
        self.out_dir = os.path.join(
            t.OUTPUT_DIRECTORY, datetime.now().strftime("%m-%d-%Y:%H:%M:%S") + suffix
        )
        os.makedirs(self.out_dir, exist_ok=True)
        self.logger = MetricLogger(os.path.join(self.out_dir, "logs"))
        self.checkpoint_path = os.path.join(self.out_dir, "detector.ckpt")
        self.avg = RunningAverage()

        train_ds = config.DATASET.TRAIN
        test_ds = config.DATASET.TEST
        self.train_dataset = EpisodeDataset(
            train_ds.IMAGE_ROOT, train_ds.ANNOTATION_ROOT, train_ds.MODE,
            train_aug=True, resolution=model.img_size, max_boxes=model.max_boxes,
        )
        self.test_dataset = EpisodeDataset(
            test_ds.IMAGE_ROOT, test_ds.ANNOTATION_ROOT, test_ds.MODE,
            train_aug=False, resolution=model.img_size, max_boxes=model.max_boxes,
            uid_offset=len(self.train_dataset),
        )

        self.batch_size = int(t.BATCH_SIZE)
        self.max_epochs = int(t.MAX_EPOCHS)
        self.save_window = int(t.get("SAVE_WINDOW", 0) or 0)
        self.grad_clip = float(t.get("GRAD_NORM_CLIP", 1.0))
        self.num_workers = int(t.get("NUM_WORKERS", 2))

        if self.type == "interactron_random":
            # quirk preserved: config LRs ignored (interactron_random_trainer.py:70-71)
            self.detector_lr, self.supervisor_lr = 1e-5, 1e-4
        else:
            self.detector_lr = float(t.get("DETECTOR_LR", 1e-5))
            self.supervisor_lr = float(t.get("SUPERVISOR_LR", 1e-4))
        self.single_optimizer = self.type == "direct_supervision"
        # reference key is LEARNING_RATE (direct_supervision_trainer.py:69);
        # LR kept as a fallback for older local configs
        self.learning_rate = float(t.get("LEARNING_RATE", t.get("LR", 1e-4)))
        self.lr_decay = bool(t.get("LR_DECAY", False))
        self.warmup_tokens = float(t.get("WARMUP_TOKENS", 0) or 0)
        self.final_tokens = float(t.get("FINAL_TOKENS", 0) or 0)

        # mesh: data-parallel over all devices when the batch divides evenly
        n_dev = len(jax.devices())
        if mesh is not None:
            self.mesh = mesh
        elif n_dev > 1 and self.batch_size % n_dev == 0:
            self.mesh = make_mesh(tp=1)
        else:
            self.mesh = None
        if jax.process_count() > 1:
            assert self.mesh is not None, (
                f"multi-process training needs BATCH_SIZE divisible by the "
                f"{n_dev} global devices (got {self.batch_size})"
            )
        self.tokens = 0
        self._build_step()

    # ------------------------------------------------------------------ step

    def _build_step(self):
        task = self.model
        if self.single_optimizer:
            self.opts = {
                "all": optax.inject_hyperparams(optax.adam)(learning_rate=self.learning_rate)
            }
        else:
            self.opts = {
                "detector": optax.inject_hyperparams(optax.adam)(learning_rate=self.detector_lr),
                "fusion": optax.inject_hyperparams(optax.adam)(learning_rate=self.supervisor_lr),
            }

        grads_fn = (
            data_parallel_grads(task, self.mesh) if self.mesh is not None else task.grads_and_metrics
        )

        def train_step(params, frozen, opt_states, batch, rng, sup_lr_scale, path_state):
            grads, metrics, path_state = grads_fn(params, frozen, batch, rng, path_state)
            grads, gnorm = global_norm_clip(grads, self.grad_clip)
            metrics["grad_norm"] = gnorm
            new_params = dict(params)
            new_opt_states = dict(opt_states)
            if self.single_optimizer:
                st = opt_states["all"]
                st.hyperparams["learning_rate"] = jnp.asarray(
                    self.learning_rate * sup_lr_scale
                )
                upd, st = self.opts["all"].update(grads, st, params)
                new_params = optax.apply_updates(params, upd)
                new_opt_states = {"all": st}
            else:
                std = opt_states["detector"]
                upd_d, std = self.opts["detector"].update(
                    grads["detector"], std, params["detector"]
                )
                new_params["detector"] = optax.apply_updates(params["detector"], upd_d)
                new_opt_states["detector"] = std
                if "fusion" in params:
                    sts = opt_states["fusion"]
                    sts.hyperparams["learning_rate"] = jnp.asarray(
                        self.supervisor_lr * sup_lr_scale, jnp.float32
                    )
                    upd_s, sts = self.opts["fusion"].update(
                        grads["fusion"], sts, params["fusion"]
                    )
                    new_params["fusion"] = optax.apply_updates(params["fusion"], upd_s)
                    new_opt_states["fusion"] = sts
            return new_params, new_opt_states, metrics, path_state

        # donate params/opt-state/path-state buffers: updates happen in place.
        # Multi-process, the lockstep wrapper AOT-compiles each new batch
        # shape and barriers all processes between compile and dispatch, so
        # per-host compile skew can never trip the collective transport's
        # startup handshake (parallel/lockstep.py).
        from interactron_tpu.parallel.lockstep import LockstepFn

        self._train_step = LockstepFn(train_step, "train_step", donate_argnums=(0, 2, 6))
        self._eval_step = LockstepFn(task.eval_metrics, "eval_step")

    # ------------------------------------------------------------------ train

    def init_state(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(42)
        params, frozen = self.model.init(rng)
        if self.single_optimizer:
            opt_states = {"all": self.opts["all"].init(params)}
        else:
            opt_states = {"detector": self.opts["detector"].init(params["detector"])}
            if "fusion" in params:
                opt_states["fusion"] = self.opts["fusion"].init(params["fusion"])
        n_rows = len(self.train_dataset) + len(self.test_dataset) + 1
        path_state = self.model.init_path_state(n_rows)
        return params, frozen, opt_states, path_state

    def _lr_scale(self):
        if not self.lr_decay:
            return 1.0
        # Quirk preserved: the reference's optimizers are constructed at the
        # FULL configured LR and only re-set the param-group lr AFTER each
        # step (interactron_trainer.py:114-126, direct_supervision_trainer.py:
        # 105-118), so the very first training step always runs at scale 1.0
        # even inside warmup; the schedule applies from the second step on.
        if self.tokens == 0:
            return 1.0
        if self.tokens < self.warmup_tokens:
            return float(self.tokens) / float(max(1, self.warmup_tokens))
        progress = float(self.tokens - self.warmup_tokens) / float(
            max(1, self.final_tokens - self.warmup_tokens)
        )
        return max(0.1, 0.5 * (1.0 + math.cos(math.pi * progress)))

    def _advance_tokens(self, global_rows, seq_len):
        """Token-unit quirk: direct_supervision counts EPISODES
        (direct_supervision_trainer.py:107); the interactron trainers count
        FRAMES (interactron_trainer.py:115)."""
        self.tokens += global_rows if self.single_optimizer else global_rows * seq_len

    def train(self, max_epochs=None, rng=None, resume_from=None):
        max_epochs = max_epochs if max_epochs is not None else self.max_epochs
        params, frozen, opt_states, path_state = self.init_state(rng)
        start_epoch = 1
        resume_from = resume_from or self.config.TRAINER.get("RESUME_FROM")
        if resume_from and os.path.exists(resume_from):
            target = {"params": params, "frozen": frozen, "opt": opt_states,
                      "epoch": 0, "tokens": 0, "path_state": path_state}
            try:
                state = load_pytree(resume_from, target)
            except Exception:
                # older checkpoints lack the frozen collection
                del target["frozen"]
                state = load_pytree(resume_from, target)
            params, opt_states = state["params"], state["opt"]
            frozen = state.get("frozen", frozen)
            path_state = state.get("path_state", path_state)
            start_epoch = int(state["epoch"]) + 1
            self.tokens = int(state["tokens"])
            print(f"resumed from {resume_from} at epoch {start_epoch}")
        key = jax.random.PRNGKey(1234)

        def run_epoch(split, params, opt_states, path_state, key, epoch):
            is_train = split == "train"
            ds = self.train_dataset if is_train else self.test_dataset
            # test epochs keep partial tail batches (the reference's test
            # DataLoader does; dropping them silently skips episodes from the
            # per-epoch metrics). Train keeps fixed shapes: the sharded train
            # step requires batch % dp == 0, and a skipped tail batch only
            # reorders which episodes a shuffle epoch sees.
            loader = EpisodeLoader(
                ds, self.batch_size, shuffle=is_train, num_workers=self.num_workers,
                seed=epoch, drop_last=is_train,
                process_index=jax.process_index(), process_count=jax.process_count(),
            )
            # Metrics accumulate DEVICE-side (async jnp adds) and are fetched
            # ONCE per epoch: per-iteration float() fetches serialized
            # host<->device through the tunnel every step (VERDICT r2 #8).
            # The epoch value stays the reference's per-iteration mean
            # (TBLogger buffers per iteration, logging_utils.py:6-41).
            macc, nb = None, 0
            for it, batch in enumerate(loader):
                key, sub = jax.random.split(key)
                global_rows = batch.get("_global_rows", batch["frames"].shape[0])
                db = {
                    k: v for k, v in batch.items()
                    if k not in ("initial_image_path", "_global_rows")
                }
                if self.mesh is not None:
                    # An uneven tail batch (test epochs keep partial tails,
                    # drop_last=False) cannot shard over 'dp' — device_put
                    # with P('dp') on a non-divisible batch raises. Replicate
                    # it instead: every device redundantly computes the tail
                    # (exact metrics, placement-compatible with the sharded
                    # steps); jit compiles one extra tail shape per epoch.
                    # Multi-process, each process feeds its local slice and
                    # shard_batch assembles the global array.
                    db = shard_batch(db, self.mesh, global_rows=global_rows)
                if is_train:
                    scale = self._lr_scale()
                    params, opt_states, metrics, path_state = self._train_step(
                        params, frozen, opt_states, db, sub, scale, path_state
                    )
                    self._advance_tokens(global_rows, batch["frames"].shape[1])
                    base_lr = (
                        self.learning_rate if self.single_optimizer else self.supervisor_lr
                    )
                    self.logger.add_value("Train/LR", base_lr * scale)
                else:
                    metrics, path_state = self._eval_step(params, frozen, db, sub, path_state)
                macc = metrics if macc is None else jax.tree_util.tree_map(jnp.add, macc, metrics)
                nb += 1
            prefix = "Train" if is_train else "Test"
            mean_loss = 0.0
            if macc is not None:
                host = jax.device_get(macc)  # single per-epoch sync
                for k, v in host.items():
                    self.logger.add_value(f"{prefix}/{k}", float(v) / nb)
                mean_loss = float(host["total_loss"]) / nb
            return params, opt_states, path_state, key, mean_loss

        def run_evaluation(params, opt_states, path_state, key, epoch):
            params, opt_states, path_state, key, _ = run_epoch(
                "test", params, opt_states, path_state, key, epoch
            )
            if self.evaluator is not None:
                ap50, ap, tp, fp, fn = self.evaluator.evaluate(
                    save_results=False, params=params, frozen=frozen
                )
                for name, v in [("mAP_50", ap50), ("mAP", ap), ("TP", tp), ("FP", fp), ("FN", fn)]:
                    self.logger.add_value(f"Test/{name}", v)
            return params, opt_states, path_state, key

        params, opt_states, path_state, key = run_evaluation(params, opt_states, path_state, key, 0)
        self.logger.log_values()
        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            params, opt_states, path_state, key, train_loss = run_epoch(
                "train", params, opt_states, path_state, key, epoch
            )
            params, opt_states, path_state, key = run_evaluation(
                params, opt_states, path_state, key, epoch
            )
            self.logger.add_value("Train/epoch_seconds", time.time() - t0)
            means = self.logger.log_values()
            print(f"epoch {epoch}: train loss {train_loss:.5f} ({time.time()-t0:.1f}s)")
            if self.save_window and max_epochs - epoch <= self.save_window:
                self.avg.add(params, 1.0 / self.save_window)
            if jax.process_index() == 0:  # params replicate: rank 0 saves
                save_pytree(
                    os.path.join(self.out_dir, "last_state.ckpt"),
                    {"params": params, "frozen": frozen, "opt": opt_states,
                     "epoch": epoch, "tokens": self.tokens, "path_state": path_state},
                )
        final = self.avg.value(like=jax.device_get(params))
        # the frozen collection (stem+layer1 kernels, all BN stats) must ship
        # with the checkpoint or a fresh process cannot reproduce the model
        if jax.process_index() == 0:
            save_pytree(
                self.checkpoint_path,
                {"params": final if final is not None else jax.device_get(params),
                 "frozen": jax.device_get(frozen)},
            )
        return params, frozen
