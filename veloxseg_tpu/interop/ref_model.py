"""Load the reference PyTorch VeloxSeg for numerical parity testing.

Imports the reference ``model`` package from a source tree (default
``/root/reference`` or ``$VELOXSEG_REFERENCE``) with the MONAI stub
installed. Used only by tests — never at framework runtime.
"""

from __future__ import annotations

import importlib
import os
import sys
from typing import Optional

from . import monai_stub

DEFAULT_REFERENCE = os.environ.get("VELOXSEG_REFERENCE", "/root/reference")


def reference_available(root: Optional[str] = None) -> bool:
    root = root or DEFAULT_REFERENCE
    return os.path.isfile(os.path.join(root, "model", "VeloxSeg.py"))


def build_reference_model(model_config: dict, root: Optional[str] = None):
    """Instantiate the reference ``model.VeloxSeg.VeloxSeg`` (CPU torch).

    ``model_config`` is a reference-format kwargs dict
    (``config/models_config_*.json`` key ``VeloxSeg``).
    """
    root = root or DEFAULT_REFERENCE
    if not reference_available(root):
        raise FileNotFoundError(f"reference model not found under {root}")
    monai_stub.install()
    if root not in sys.path:
        sys.path.insert(0, root)
    mod = importlib.import_module("model.VeloxSeg")
    cfg = dict(model_config)
    cfg.pop("norm_layer", None)
    return mod.VeloxSeg(**cfg)
