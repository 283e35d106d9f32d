from .sliding_window import sliding_window_inference, compute_tile_origins

__all__ = ["sliding_window_inference", "compute_tile_origins"]
