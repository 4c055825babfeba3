"""Training entry point — same public surface as the reference train.py:13-24:
seed everything with 42, build model/evaluator/trainer from the YAML, train.
"""

import random

import numpy as np

from interactron_tpu.utils.config import build_evaluator, build_model, build_trainer, get_args, get_config


def _maybe_init_distributed():
    """Multi-host: initialize jax.distributed when a coordinator is
    configured (the TPU-native analog of the reference's vestigial
    init_distributed_mode, misc.py:405-427 — which was never called; here it
    actually works and is exercised by tests/test_distributed.py).

    Env contract (mirrors the reference's RANK/WORLD_SIZE parsing):
      JAX_COORDINATOR_ADDRESS  host:port of process 0 (required to engage)
      JAX_NUM_PROCESSES        world size  (optional on TPU pods — the PJRT
      JAX_PROCESS_ID           rank         runtime auto-detects both)
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return False
    import jax

    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc) if nproc is not None else None,
        process_id=int(pid) if pid is not None else None,
    )
    print(
        f"jax.distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
    return True


def train():
    args = get_args()
    random.seed(42)
    np.random.seed(42)
    _maybe_init_distributed()
    config = get_config(args.config_file)
    model = build_model(config)
    evaluator = build_evaluator(model, config, load_checkpoint=False)
    trainer = build_trainer(model, config, evaluator=evaluator)
    trainer.train()


if __name__ == "__main__":
    train()
