from .anchor_head_single import AnchorHeadSingle, build_dense_head  # noqa: F401
