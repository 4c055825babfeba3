"""interactron-tpu: a TPU-native (JAX/Flax/Pallas) framework for embodied
adaptive object detection with the capabilities of allenai/interactron.

Built from scratch, TPU-first:
  * the DETR detector and fusion transformer are Flax modules with fixed
    shapes and bf16-friendly compute,
  * Hungarian matching, the set criterion, and NMS run on-device,
  * the MAML-style inner loop is `jax.grad` through a clipped SGD step
    (second order for the supervisor, first order for the detector),
  * episodes are vmapped/scanned and sharded over a `jax.sharding.Mesh`.

Reference behavior citations point into the upstream repo (mounted read-only
at /root/reference) as `file:line`.
"""

__version__ = "0.1.0"
