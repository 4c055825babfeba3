"""YAML -> typed config tree + CLI parsing + component factories.

Mirrors the reference public surface (utils/config_utils.py:9-117): the same
YAML keys drive the same four experiment presets, attribute access works on
nested sections, and numeric strings coerce to int/float. The factories
dispatch on the TYPE strings the reference accepts (minus the dead branches
documented in SURVEY.md §2.1).
"""

import argparse
import os

import yaml


def _coerce(v):
    """Coerce numeric strings to int/float like the reference Config does
    (utils/config_utils.py:19-33)."""
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            pass
        try:
            return float(v)
        except ValueError:
            pass
    return v


class Config:
    """Recursive attribute-object over a YAML dict."""

    def __init__(self, d):
        self._raw = d
        for k, v in d.items():
            if isinstance(v, dict):
                setattr(self, k, Config(v))
            else:
                setattr(self, k, _coerce(v))

    def get(self, key, default=None):
        return getattr(self, key, default)

    def to_dict(self):
        return self._raw

    def __repr__(self):
        return f"Config({self._raw})"


def get_config(path):
    assert os.path.exists(path), f"Config file {path} does not exist"
    with open(path) as f:
        return Config(yaml.safe_load(f))


def get_args():
    parser = argparse.ArgumentParser(description="interactron-tpu")
    parser.add_argument("--config_file", type=str, required=True, help="Path to experiment YAML")
    parser.add_argument("--devices", type=str, default=None, help="Optional device-count override for the mesh")
    return parser.parse_args()


VALID_MODELS = ("detr", "detr_multiframe", "interactron_random", "interactron")
VALID_TRAINERS = ("interactron", "interactron_random", "direct_supervision")
VALID_EVALUATORS = ("random_policy_evaluator", "interactive_evaluator")


def _arg_check(kind, value, valid):
    assert value in valid, f"{kind} type {value!r} not in {valid}"


def build_model(config):
    """String-dispatched model factory (utils/config_utils.py:53-77)."""
    t = config.MODEL.TYPE
    _arg_check("model", t, VALID_MODELS)
    from interactron_tpu import tasks

    return {
        "detr": tasks.DETRTask,
        "detr_multiframe": tasks.MultiFrameTask,
        "interactron_random": tasks.InteractronRandomTask,
        "interactron": tasks.InteractronTask,
    }[t](config)


def build_trainer(model, config, evaluator=None):
    t = config.TRAINER.TYPE
    _arg_check("trainer", t, VALID_TRAINERS)
    from interactron_tpu.engine.trainer import Trainer

    return Trainer(model, config, evaluator=evaluator)


def build_evaluator(model, config, load_checkpoint=False):
    t = config.EVALUATOR.TYPE
    _arg_check("evaluator", t, VALID_EVALUATORS)
    from interactron_tpu.engine.evaluator import InteractiveEvaluator, RandomPolicyEvaluator

    cls = RandomPolicyEvaluator if t == "random_policy_evaluator" else InteractiveEvaluator
    return cls(model, config, load_checkpoint=load_checkpoint)
