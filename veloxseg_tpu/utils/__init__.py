from .runtime import (
    a2fseg_deep_output_groups,
    expected_input_channels,
    image_label_modes,
    normalized_deep_loss_weights,
    resolve_modal_index,
    rotation_range_from_degrees,
    select_modal_items,
    validate_file_groups,
    validate_selected_modal,
    veloxseg_output_layout,
)
from .layout import to_channels_last, to_channels_first

__all__ = [
    "a2fseg_deep_output_groups",
    "expected_input_channels",
    "image_label_modes",
    "normalized_deep_loss_weights",
    "resolve_modal_index",
    "rotation_range_from_degrees",
    "select_modal_items",
    "validate_file_groups",
    "validate_selected_modal",
    "veloxseg_output_layout",
    "to_channels_last",
    "to_channels_first",
]
