from .nifti import NiftiImage, load_nifti, save_nifti
from .transforms import (
    crop_foreground,
    rand_crop_by_pos_neg_label,
    rand_rotate_z,
    normalize_mri_volume,
    normalize_pet_zscore,
    normalize_ct_global,
)
from .dataset import SegmentationDataset, PatchLoader

__all__ = [
    "NiftiImage", "load_nifti", "save_nifti", "crop_foreground",
    "rand_crop_by_pos_neg_label", "rand_rotate_z", "normalize_mri_volume",
    "normalize_pet_zscore", "normalize_ct_global", "SegmentationDataset",
    "PatchLoader",
]
