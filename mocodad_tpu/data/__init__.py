from mocodad_tpu.data.pipeline import (  # noqa: F401
    PoseWindows, build_dataset, make_loader, num_batches)
from mocodad_tpu.data.transforms import (  # noqa: F401
    affine_transform_matrices, apply_affine_batch, apply_affine_np,
    transformed_gt_data)
