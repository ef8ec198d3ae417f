from fetal_mri_segmentation_tpu.ops.dice import (  # noqa: F401
    dice_coefficient,
    dice_coefficient_loss,
    weighted_dice_coefficient,
    weighted_dice_coefficient_loss,
    label_wise_dice_coefficient,
    get_label_dice_coefficient_function,
)
from fetal_mri_segmentation_tpu.ops.patches import (  # noqa: F401
    compute_patch_indices,
    get_patch_from_3d_data,
    reconstruct_from_patches,
    gaussian_importance_map,
)
# NOTE: fold()/unfold() are deliberately NOT re-exported here — the bare
# name `fold` would shadow the `ops.fold` submodule attribute. Use
# `from fetal_mri_segmentation_tpu.ops.fold import fold, unfold`.
from fetal_mri_segmentation_tpu.ops.fold import (  # noqa: F401
    conv3_folded,
    conv3_folded_stride2,
    pool_folded,
    up_conv3_folded,
)
