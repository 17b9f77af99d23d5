from .base_bev_backbone import BaseBEVBackbone, build_backbone_2d  # noqa: F401
from .map_to_bev import PointPillarScatter, HeightCompression, build_map_to_bev  # noqa: F401
