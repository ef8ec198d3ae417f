from fetal_mri_segmentation_tpu.parallel.data_parallel import (  # noqa: F401
    make_mesh, make_dp_train_step, make_dp_eval_step, shard_batch,
    replicate_state, unreplicate)
from fetal_mri_segmentation_tpu.parallel.spatial import (  # noqa: F401
    make_direct_predictor, make_gspmd_eval_step, make_gspmd_train_step,
    make_hybrid_mesh, make_spatial_predictor, shard_batch_spatial)
