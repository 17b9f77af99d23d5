from .pvrcnn_head import PVRCNNHead, build_roi_head  # noqa: F401
