"""TPU-native op library.

Replaces the reference's CUDA extensions (SURVEY.md §2.1):
  - ``pcdet/ops/iou3d_nms``   → :mod:`.iou3d`, :mod:`.nms`
  - ``pcdet/ops/roiaware_pool3d`` (points-in-boxes / density) → :mod:`.points_in_boxes`
  - spconv voxelizer          → :mod:`.voxelize`
  - spconv sparse conv        → :mod:`.sparse`
  - ``pcdet/ops/pointnet2``   → :mod:`.pointnet2`

All ops are pure JAX with fixed shapes + validity masks; the hot ones have
Pallas TPU kernels under :mod:`.pallas_kernels`.
"""
