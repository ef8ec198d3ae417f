from fetal_mri_segmentation_tpu.data.build import (  # noqa: F401
    DataFile, open_data_file, write_data_to_file)
from fetal_mri_segmentation_tpu.data.normalize import (  # noqa: F401
    normalize_data, normalize_data_storage, normalize_data_storage_per_volume)
