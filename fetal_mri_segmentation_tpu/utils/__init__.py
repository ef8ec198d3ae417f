from fetal_mri_segmentation_tpu.utils.io_utils import pickle_dump, pickle_load  # noqa: F401
from fetal_mri_segmentation_tpu.utils.nifti import NiftiImage, load_nifti, save_nifti  # noqa: F401
