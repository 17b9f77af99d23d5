from .point_head_simple import PointHeadSimple, build_point_head  # noqa: F401
