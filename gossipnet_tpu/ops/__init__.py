from gossipnet_tpu.ops.geometry import (  # noqa: F401
    box_area,
    pairwise_iou,
    pairwise_iof,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from gossipnet_tpu.ops.matching import greedy_match  # noqa: F401
