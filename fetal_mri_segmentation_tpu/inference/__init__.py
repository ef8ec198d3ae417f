from fetal_mri_segmentation_tpu.inference.sliding_window import (  # noqa: F401
    SlidingWindowPredictor, patch_wise_prediction)
from fetal_mri_segmentation_tpu.inference.predict import (  # noqa: F401
    run_validation_cases, run_validation_case, prediction_to_image,
    get_prediction_labels, predict_case, resolve_case_files)
