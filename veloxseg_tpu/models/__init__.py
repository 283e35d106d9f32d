from .registry import load_model, register_model, available_models

__all__ = ["load_model", "register_model", "available_models"]
