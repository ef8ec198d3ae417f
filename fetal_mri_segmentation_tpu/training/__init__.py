from fetal_mri_segmentation_tpu.training.state import (  # noqa: F401
    TrainState, create_train_state, make_optimizer)
from fetal_mri_segmentation_tpu.training.train_step import (  # noqa: F401
    make_train_step, make_eval_step)
from fetal_mri_segmentation_tpu.training.loop import train_model  # noqa: F401
from fetal_mri_segmentation_tpu.training.checkpoint import (  # noqa: F401
    CheckpointIO, load_old_model)
