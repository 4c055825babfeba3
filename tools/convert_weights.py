"""CLI shim — conversion logic lives in interactron_tpu.utils.convert_weights
so the package can consume MODEL.WEIGHTS torch checkpoints directly
(reference loads them at model construction, models/interactron.py:23)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interactron_tpu.utils.convert_weights import (  # noqa: F401,E402
    _conv,
    _frozen_bn,
    _linear,
    _mha,
    convert_detector,
    convert_fusion_gpt,
    convert_fusion_xattn,
    main,
)

if __name__ == "__main__":
    main()
