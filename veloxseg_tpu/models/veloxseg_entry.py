"""VeloxSeg registry entry (``utils/load_model.py:83-85`` parity)."""

from __future__ import annotations

from ..core.config import VeloxSegConfig
from ..nn.veloxseg import VeloxSeg
from .registry import register_model


@register_model("VeloxSeg")
def build_veloxseg(cfg_dict: dict) -> VeloxSeg:
    return VeloxSeg(VeloxSegConfig.from_dict(cfg_dict))
