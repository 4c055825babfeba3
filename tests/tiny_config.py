"""Tiny shared test config: real architecture wiring, minuscule dims so the
meta step runs on the 1-core CPU test host in seconds."""

from interactron_tpu.utils.config import Config

IMG = 32          # -> 2x2 feature map
NUM_CLASSES = 7
NUM_QUERIES = 6
D_MODEL = 16
EMB = 16


def tiny_config(model_type="interactron", batch_size=2):
    img_len = (IMG // 16) ** 2
    block = 5 * (img_len + NUM_QUERIES) + 5
    return Config(
        {
            "MODEL": {
                "TYPE": model_type,
                "NUM_CLASSES": NUM_CLASSES,
                "BACKBONE": "tiny",
                "TEST_RESOLUTION": IMG,
                "NUM_QUERIES": NUM_QUERIES,
                "D_MODEL": D_MODEL,
                "DETR_NUM_HEADS": 2,
                "NUM_ENCODER_LAYERS": 1,
                "NUM_DECODER_LAYERS": 1,
                "DETR_FF_DIM": 32,
                "SET_COST_CLASS": 1.0,
                "SET_COST_BBOX": 5.0,
                "SET_COST_GIOU": 2.0,
                "PREDICT_ACTIONS": True,
                "NUM_LAYERS": 1,
                "NUM_HEADS": 2,
                "EMBEDDING_DIM": EMB,
                "BLOCK_SIZE": block,
                "IMG_FEATURE_SIZE": D_MODEL,
                "OUTPUT_SIZE": EMB,
                "BOX_EMB_SIZE": D_MODEL,
                "EMBEDDING_PDROP": 0.1,
                "RESIDUAL_PDROP": 0.1,
                "ATTENTION_PDROP": 0.1,
                "ADAPTIVE_LR": 1e-3,
            },
            "TRAINER": {
                "TYPE": "interactron",
                "BATCH_SIZE": batch_size,
                "INNER_BATCH": 1,
                "MAX_EPOCHS": 2,
                "SAVE_WINDOW": 1,
                "DETECTOR_LR": 1e-5,
                "SUPERVISOR_LR": 1e-4,
                "GRAD_NORM_CLIP": 1.0,
                "OPTIM_TYPE": "Adam",
                "LR_DECAY": False,
                "WARMUP_TOKENS": 0,
                "FINAL_TOKENS": 8000000,
                "NUM_WORKERS": 0,
                "OUTPUT_DIRECTORY": "/tmp/interactron_tpu_test_out",
            },
            "EVALUATOR": {
                "TYPE": "random_policy_evaluator",
                "BATCH_SIZE": 1,
                "NUM_WORKERS": 0,
                "OUTPUT_DIRECTORY": "/tmp/interactron_tpu_test_eval",
            },
        }
    )


def tiny_batch(rng, b=2, s=5, m=4):
    import numpy as np

    frames = rng.randn(b, s, IMG, IMG, 3).astype("float32") * 0.1
    actions = rng.randint(0, 4, (b, s)).astype("int32")
    labels = rng.randint(0, NUM_CLASSES, (b, s, m)).astype("int32")
    boxes = np.stack(
        [
            rng.uniform(0.3, 0.7, (b, s, m)),
            rng.uniform(0.3, 0.7, (b, s, m)),
            rng.uniform(0.1, 0.3, (b, s, m)),
            rng.uniform(0.1, 0.3, (b, s, m)),
        ],
        axis=-1,
    ).astype("float32")
    nvalid = rng.randint(1, m + 1, (b, s))
    valid = np.arange(m)[None, None, :] < nvalid[..., None]
    return {
        "frames": frames,
        "actions": actions,
        "labels": labels * valid,
        "boxes": boxes * valid[..., None],
        "valid": valid,
        "episode_uid": np.arange(b, dtype="int32"),
    }
