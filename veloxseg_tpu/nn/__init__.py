from .norms import LayerNorm, InstanceNorm
from .basic import FFN, DropPath, GroupedConv3d, get_act
from .conv_blocks import DownConv, UpConv, JLC, JLCLayer
from .patch import PatchEmbed, PatchMerging
from .pwa import MultiModalPWA, PWABlock, TransformerStage
from .encoder import ConvEncoder, TransformerEncoder, Encoder
from .decoder import SegDecoder, RCDecoder
from .veloxseg import VeloxSeg

__all__ = [
    "LayerNorm", "InstanceNorm", "FFN", "DropPath", "GroupedConv3d",
    "get_act", "DownConv", "UpConv", "JLC", "JLCLayer", "PatchEmbed",
    "PatchMerging", "MultiModalPWA", "PWABlock", "TransformerStage",
    "ConvEncoder", "TransformerEncoder", "Encoder", "SegDecoder",
    "RCDecoder", "VeloxSeg",
]
