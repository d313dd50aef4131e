from .resnet import ResNetBackbone
from .fpn import FPN
from .encoder import Encoder
from .head import LaneHead
from .phnet import PHNet
from .deform_attn import MSDeformAttn
from .seg_decoder import SegDecoder
from .flow_warp import WarpModel, flow_warp
from .roi_gather import ROIGather

__all__ = [
    "ResNetBackbone", "FPN", "Encoder", "LaneHead", "PHNet",
    "MSDeformAttn", "SegDecoder", "WarpModel", "flow_warp", "ROIGather",
]
