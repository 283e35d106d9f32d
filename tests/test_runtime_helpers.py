"""Parity tests for the pure runtime helpers.

Mirrors the coverage of the reference's only unit-test file
(``tests/test_runtime_helpers.py``).
"""

import pytest

from veloxseg_tpu.utils.runtime import (
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


def test_resolve_modal_index_default_all():
    assert resolve_modal_index(None, 3) == [1, 1, 1]


def test_resolve_modal_index_one_hot():
    assert resolve_modal_index(1, 2) == [0, 1]
    assert resolve_modal_index("0", 2) == [1, 0]


def test_resolve_modal_index_errors():
    with pytest.raises(ValueError):
        resolve_modal_index(None, 0)
    with pytest.raises(ValueError):
        resolve_modal_index(2, 2)
    with pytest.raises(ValueError):
        resolve_modal_index("x", 2)


def test_expected_input_channels():
    cfg = {
        "VeloxSeg": {"in_ch": [1, 1]},
        "UNet": {"in_channels": 2},
        "Other": {"model_num": 4},
        "NoInfo": {"foo": 1},
    }
    assert expected_input_channels("VeloxSeg", cfg) == 2
    assert expected_input_channels("UNet", cfg) == 2
    assert expected_input_channels("Other", cfg) == 4
    assert expected_input_channels("NoInfo", cfg) is None
    assert expected_input_channels("Missing", cfg) is None


def test_validate_selected_modal():
    cfg = {"VeloxSeg": {"in_ch": [1, 1]}}
    assert validate_selected_modal("VeloxSeg", cfg, 2, None) == [1, 1]
    one_modal_cfg = {"VeloxSeg": {"in_ch": [1]}}
    assert validate_selected_modal("VeloxSeg", one_modal_cfg, 2, 0) == [1, 0]
    with pytest.raises(ValueError):
        validate_selected_modal("VeloxSeg", cfg, 2, 0)


def test_select_modal_items():
    assert select_modal_items(["a", "b"], [1, 0]) == ["a"]
    with pytest.raises(ValueError):
        select_modal_items(["a"], [1, 0])
    with pytest.raises(ValueError):
        select_modal_items(["a", "b"], [0, 0])


def test_validate_file_groups():
    assert validate_file_groups("ds", {"ct": ["a"], "pet": ["b"],
                                       "label": ["c"]}) == 1
    with pytest.raises(ValueError):
        validate_file_groups("ds", {"ct": [], "pet": ["b"]})
    with pytest.raises(ValueError):
        validate_file_groups("ds", {"ct": ["a"], "pet": ["b", "c"]})


def test_rotation_and_modes():
    import math
    assert rotation_range_from_degrees(15) == pytest.approx(
        math.radians(15.0))
    assert image_label_modes(2) == ("bilinear", "bilinear", "nearest")
    with pytest.raises(ValueError):
        image_label_modes(0)


def test_normalized_deep_loss_weights():
    assert normalized_deep_loss_weights([1, 1, 1, 1], 4) == [0.25] * 4
    assert normalized_deep_loss_weights([1, 1, 1, 1], 2) == [0.5, 0.5]
    assert normalized_deep_loss_weights([2, 1, 1], 3) == [0.5, 0.25, 0.25]
    with pytest.raises(ValueError):
        normalized_deep_loss_weights([2, 1], 3)
    with pytest.raises(ValueError):
        normalized_deep_loss_weights([0, 0], 2)
    with pytest.raises(ValueError):
        normalized_deep_loss_weights([1], 0)


def test_a2fseg_deep_output_groups():
    assert a2fseg_deep_output_groups(11) == [(1, 6), (6, 11)]
    with pytest.raises(ValueError):
        a2fseg_deep_output_groups(10)
    with pytest.raises(ValueError):
        a2fseg_deep_output_groups(1)


def test_veloxseg_output_layout():
    layout = veloxseg_output_layout(8, 2)
    assert layout["seg"] == (0, 4)
    assert layout["reconstruction"] == 4
    assert layout["decoder_gram"] == 5
    assert layout["teacher_grams"] == (6, 7)

    layout1 = veloxseg_output_layout(7, 1)
    assert layout1["seg"] == (0, 4)
    assert layout1["teacher_grams"] == (6,)

    with pytest.raises(ValueError):
        veloxseg_output_layout(4, 2)
