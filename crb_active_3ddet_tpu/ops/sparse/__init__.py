"""TPU-native sparse 3D convolution.

Replaces the external spconv dependency (``pcdet/utils/spconv_utils.py:3-8``,
``SubMConv3d/SparseConv3d/SparseConvTensor``) with a gather-GEMM-scatter
formulation: rulebooks are built in-jit from sorted voxel hashes (binary
search instead of GPU hash tables), and each conv layer is ONE MXU matmul
(V, K³·Cin) × (K³·Cin, Cout) over fixed-capacity padded voxel sets.
"""

from .rulebook import (build_hash_table, lookup_neighbors,
                       downsample_coords)  # noqa: F401
from .sparse_ops import (subm_conv3d_gather, sparse_tensor_to_dense)  # noqa: F401
