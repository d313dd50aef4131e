from .resnet import ResNetBackbone
from .fpn import FPN
from .encoder import Encoder
from .head import LaneHead
from .phnet import PHNet

__all__ = ["ResNetBackbone", "FPN", "Encoder", "LaneHead", "PHNet"]
