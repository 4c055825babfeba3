from interactron_tpu.tasks.detr_task import DETRTask
from interactron_tpu.tasks.interactron import InteractronRandomTask, InteractronTask
from interactron_tpu.tasks.multiframe import MultiFrameTask

__all__ = ["DETRTask", "MultiFrameTask", "InteractronRandomTask", "InteractronTask"]
