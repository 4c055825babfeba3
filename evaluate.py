"""Evaluation entry point — same public surface as the reference
evaluate.py:9-14: build model + evaluator (loading EVALUATOR.CHECKPOINT) and
run a full evaluation with saved results."""

from interactron_tpu.utils.config import build_evaluator, build_model, get_args, get_config


def evaluate():
    args = get_args()
    config = get_config(args.config_file)
    model = build_model(config)
    evaluator = build_evaluator(model, config, load_checkpoint=True)
    evaluator.evaluate(save_results=True)


if __name__ == "__main__":
    evaluate()
