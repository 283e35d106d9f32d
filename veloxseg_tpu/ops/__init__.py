from .resize import resize_trilinear, interp_matrix
from .pixel_shuffle import pixel_shuffle_3d, pixel_shuffle_2d
from .gram import gram_matrix

__all__ = [
    "resize_trilinear",
    "interp_matrix",
    "pixel_shuffle_3d",
    "pixel_shuffle_2d",
    "gram_matrix",
]
