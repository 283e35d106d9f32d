"""Model registry.

Reference: ``utils/load_model.py:3-88`` — a name → constructor mapping over
a JSON kwargs dict. Here an explicit registry; zoo models self-register on
import. ``load_model`` returns a Flax module whose ``__call__(x, train)``
follows the framework convention (channels-last input, logits out; models
with deep supervision return a list in train mode).
"""

from __future__ import annotations

from typing import Callable, Dict, List

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(builder: Callable):
        _REGISTRY[name] = builder
        return builder
    return deco


def available_models() -> List[str]:
    _ensure_builtin_imports()
    return sorted(_REGISTRY)


def load_model(model_name: str, model_config: Dict):
    """Build a model from its config entry (reference kwargs schema)."""
    _ensure_builtin_imports()
    if model_name not in _REGISTRY:
        raise ValueError(
            f"No model named {model_name!r}; available: "
            f"{available_models()}")
    return _REGISTRY[model_name](model_config[model_name])


def _ensure_builtin_imports():
    # Import for registration side effects.
    from . import veloxseg_entry  # noqa: F401
    try:
        from . import zoo  # noqa: F401
    except ImportError:
        pass
