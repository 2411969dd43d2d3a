from .layers import PointMLP, MiniPointNet
from .pointnet2 import PointSAModule, PointFPModule, PointNet2SASSG
from .vote import VoteModule
from .heads import Integral, AngleIntegral, BaseConvBboxHead, ReliableConvBboxHead
from .side_pooling import SidePooling
from .nesie_head import NesieHead

__all__ = [
    "PointMLP",
    "MiniPointNet",
    "PointSAModule",
    "PointFPModule",
    "PointNet2SASSG",
    "VoteModule",
    "Integral",
    "AngleIntegral",
    "BaseConvBboxHead",
    "ReliableConvBboxHead",
    "SidePooling",
    "NesieHead",
]
