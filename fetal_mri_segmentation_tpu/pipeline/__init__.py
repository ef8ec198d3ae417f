from fetal_mri_segmentation_tpu.pipeline.generator import (  # noqa: F401
    get_training_and_validation_generators,
    get_validation_split,
    get_multi_class_labels,
    get_number_of_steps,
    create_patch_index_list,
    data_generator,
)
from fetal_mri_segmentation_tpu.pipeline.prefetch import prefetch  # noqa: F401
