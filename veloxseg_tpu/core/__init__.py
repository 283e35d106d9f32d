from .config import (
    VeloxSegConfig,
    TrainConfig,
    TestConfig,
    load_json_config,
)
from .windows import WindowLayout, compute_window_layout

__all__ = [
    "VeloxSegConfig",
    "TrainConfig",
    "TestConfig",
    "load_json_config",
    "WindowLayout",
    "compute_window_layout",
]
