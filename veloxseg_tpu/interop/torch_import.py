"""Reference (PyTorch) VeloxSeg checkpoint → flax params.

The reference saves either a wrapped training checkpoint
(``{'model': state_dict, 'optimizer': ...}``, ``utils/load_model.py:90-109``)
or a bare state dict, optionally with a DDP-era ``module.`` prefix
(``utils/load_model.py:111-119``; ``utils/inference_petct.py:95-101``
accepts both). This module maps those keys onto the channels-last flax
parameter tree of :class:`veloxseg_tpu.nn.veloxseg.VeloxSeg`.

The mapping is purely structural (regex on the reference's module attribute
paths — ``model/VeloxSeg.py``, ``model/Encoder.py``, ``model/Decoder.py``,
``model/components/*``), so it needs no torch model instance. Weight-layout
transforms:

- Conv3d ``(O, I/g, kd, kh, kw)`` → DHWIO kernel ``(kd, kh, kw, I/g, O)``.
- 1×1 Conv3d → Dense kernel ``(I, O)``.
- ConvTranspose3d(kernel=2, stride=2) ``(I, O, 2, 2, 2)`` → Dense kernel
  ``(I, O·8)`` + pixel-shuffle (mathematically identical; see
  ``nn/conv_blocks.py`` UpConv). Channel factor order (O slowest, then the
  three shuffle axes) matches both the reference's einops pattern
  (``model/components/superpixel.py:15``) and ours.
- MONAI PatchEmbed proj Conv3d ``(E, C, p, p, p)`` → Dense kernel
  ``(p³·C, E)`` in (pd, ph, pw, c) flatten order (see ``nn/patch.py``).
- LayerNorm weight/bias → scale/bias. InstanceNorm3d is affine-free on both
  sides. ``relative_position_index`` buffers are recomputed, not loaded.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Weight-layout transforms (numpy in, numpy float32 out).
# ---------------------------------------------------------------------------

def _conv3d_w(w: np.ndarray) -> np.ndarray:
    """(O, I/g, kd, kh, kw) → (kd, kh, kw, I/g, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _conv1x1_w(w: np.ndarray) -> np.ndarray:
    """(O, I, 1, 1, 1) → Dense (I, O)."""
    return np.transpose(w.reshape(w.shape[0], w.shape[1]))


def _convT_w(w: np.ndarray) -> np.ndarray:
    """ConvTranspose3d k=s=2: (I, O, 2, 2, 2) → Dense (I, O·8)."""
    return w.reshape(w.shape[0], -1)


def _convT_b(b: np.ndarray) -> np.ndarray:
    """(O,) → (O,): UpConv keeps the ConvTranspose's TIED per-channel
    bias as a (O,) param added after the shuffle — an untied (O·8,) copy
    would diverge from the reference under training (each copy gets its
    own AdamW update; the reference's tied bias gets the summed
    gradient), breaking multi-step trajectory parity."""
    return b


def _patch_embed_w(w: np.ndarray) -> np.ndarray:
    """(E, C, pd, ph, pw) → Dense (pd·ph·pw·C, E)."""
    e = w.shape[0]
    return np.transpose(w, (2, 3, 4, 1, 0)).reshape(-1, e)


def _identity(w: np.ndarray) -> np.ndarray:
    return w


# ---------------------------------------------------------------------------
# Key mapping.
# ---------------------------------------------------------------------------

def _jlc_subkey(rest: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    """Map the inside of one JLC block (reference ``conv_blocks.py:41-75``).

    ``rest`` examples: ``spatial_convs.0.0.weight`` (multi-kernel:
    Sequential(conv, IN, act)), ``spatial_convs.0.weight`` (single kernel:
    bare conv), ``channel_conv.1.weight`` (expand), ``channel_conv.3.weight``
    (project).
    """
    m = re.fullmatch(r"spatial_convs\.(\d+)(?:\.0)?\.(weight|bias)", rest)
    if m:
        s, wb = int(m.group(1)), m.group(2)
        name = "kernel" if wb == "weight" else "bias"
        tf = _conv3d_w if wb == "weight" else _identity
        return (f"GroupedConv3d_{s}", name), tf
    m = re.fullmatch(r"channel_conv\.([13])\.(weight|bias)", rest)
    if m:
        idx = 0 if m.group(1) == "1" else 1
        wb = m.group(2)
        name = "kernel" if wb == "weight" else "bias"
        tf = _conv1x1_w if wb == "weight" else _identity
        return (f"Dense_{idx}", name), tf
    return None


def _map_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    """One reference state-dict key → (flax param path, transform).

    Returns None for buffers / keys to skip (raises on unknown keys at the
    call site so silent drops can't happen).
    """
    wb = {"weight": "kernel", "bias": "bias"}

    # --- Transformer branch ------------------------------------------------
    m = re.fullmatch(
        r"encoder\.encoder_attn\.patch_embeds\.(\d+)\.proj\.(weight|bias)",
        key)
    if m:
        mod, p = int(m.group(1)), m.group(2)
        tf = _patch_embed_w if p == "weight" else _identity
        return ("encoder", "encoder_attn", f"patch_embed_{mod}", "Dense_0",
                wb[p]), tf
    m = re.fullmatch(
        r"encoder\.encoder_attn\.patch_embeds\.(\d+)\.norm\.(weight|bias)",
        key)
    if m:  # only exists with patch_norm=True
        mod, p = int(m.group(1)), m.group(2)
        name = "scale" if p == "weight" else "bias"
        return ("encoder", "encoder_attn", f"patch_embed_{mod}",
                "LayerNorm_0", name), _identity

    blk = r"encoder\.encoder_attn\.layers\.(\d+)\.blocks\.(\d+)\."
    m = re.fullmatch(blk + r"attn\.input_norms\.(\d+)\.(weight|bias)", key)
    if m:
        i, j, mod, p = (int(m.group(1)), int(m.group(2)), int(m.group(3)),
                        m.group(4))
        name = "scale" if p == "weight" else "bias"
        return ("encoder", "encoder_attn", f"stage_{i}", f"block_{j}",
                "attn", f"norm_{mod}", name), _identity
    m = re.fullmatch(blk + r"attn\.qkv_proj\.(\d+)\.([012])\.(weight|bias)",
                     key)
    if m:
        i, j, mod = int(m.group(1)), int(m.group(2)), int(m.group(3))
        which = "qkv"[int(m.group(4))]
        p = m.group(5)
        tf = _conv1x1_w if p == "weight" else _identity
        return ("encoder", "encoder_attn", f"stage_{i}", f"block_{j}",
                "attn", f"{which}_{mod}", wb[p]), tf
    m = re.fullmatch(blk + r"attn\.mix_channels\.(\d+)\.(weight|bias)", key)
    if m:
        i, j, mod, p = (int(m.group(1)), int(m.group(2)), int(m.group(3)),
                        m.group(4))
        tf = _conv1x1_w if p == "weight" else _identity
        return ("encoder", "encoder_attn", f"stage_{i}", f"block_{j}",
                "attn", f"mix_{mod}", wb[p]), tf
    m = re.fullmatch(
        blk + r"attn\.position_embedding\.relative_position_bias_table", key)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        return ("encoder", "encoder_attn", f"stage_{i}", f"block_{j}",
                "attn", "pos_bias", "table"), _identity
    if re.fullmatch(
            blk + r"attn\.position_embedding\.relative_position_index", key):
        return None  # static buffer, recomputed at trace time
    m = re.fullmatch(blk + r"ffns\.(\d+)\.linear([12])\.(weight|bias)", key)
    if m:
        i, j, mod = int(m.group(1)), int(m.group(2)), int(m.group(3))
        idx = int(m.group(4)) - 1
        p = m.group(5)
        tf = _conv1x1_w if p == "weight" else _identity
        return ("encoder", "encoder_attn", f"stage_{i}", f"block_{j}",
                f"ffn_{mod}", f"Dense_{idx}", wb[p]), tf
    m = re.fullmatch(blk + r"norms\.(\d+)\.(weight|bias)", key)
    if m:
        i, j, mod, p = (int(m.group(1)), int(m.group(2)), int(m.group(3)),
                        m.group(4))
        name = "scale" if p == "weight" else "bias"
        return ("encoder", "encoder_attn", f"stage_{i}", f"block_{j}",
                f"ffn_norm_{mod}", name), _identity
    m = re.fullmatch(
        r"encoder\.encoder_attn\.layers\.(\d+)\.downs\.(\d+)\.reduction\."
        r"weight", key)
    if m:
        i, mod = int(m.group(1)), int(m.group(2))
        return ("encoder", "encoder_attn", f"stage_{i}", f"down_{mod}",
                "Dense_0", "kernel"), _conv1x1_w
    m = re.fullmatch(
        r"encoder\.encoder_attn\.layers\.(\d+)\.downs\.(\d+)\.norm\."
        r"(weight|bias)", key)
    if m:
        i, mod, p = int(m.group(1)), int(m.group(2)), m.group(3)
        name = "scale" if p == "weight" else "bias"
        return ("encoder", "encoder_attn", f"stage_{i}", f"down_{mod}",
                "LayerNorm_0", name), _identity

    # --- Conv branch (fused into our Encoder as conv_down/conv_layer) -----
    m = re.fullmatch(r"encoder\.encoder_conv\.down(\d+)\.down\.(weight|bias)",
                     key)
    if m:
        k, p = int(m.group(1)), m.group(2)
        tf = _conv3d_w if p == "weight" else _identity
        return ("encoder", f"conv_down{k}", "GroupedConv3d_0", wb[p]), tf
    m = re.fullmatch(r"encoder\.encoder_conv\.layer(\d+)\.(\d+)\.(.+)", key)
    if m:
        k, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        sub = _jlc_subkey(rest)
        if sub is None:
            raise KeyError(f"unmapped JLC key: {key}")
        path, tf = sub
        return ("encoder", f"conv_layer{k}", f"JLC_{j}") + path, tf
    m = re.fullmatch(r"encoder\.attn2conv_(\d+)\.0\.(weight|bias)", key)
    if m:
        k, p = int(m.group(1)), m.group(2)
        tf = _conv1x1_w if p == "weight" else _identity
        return ("encoder", f"attn2conv_{k}", wb[p]), tf

    # --- Student (segmentation) decoder ------------------------------------
    m = re.fullmatch(r"decoder\.layer_up(\d+)\.up\.(weight|bias)", key)
    if m:
        t, p = int(m.group(1)), m.group(2)
        tf = _convT_w if p == "weight" else _convT_b
        return ("decoder", f"up{t}", "Dense_0", wb[p]), tf
    m = re.fullmatch(r"decoder\.layer(\d+)\.(\d+)\.(.+)", key)
    if m:
        t, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        sub = _jlc_subkey(rest)
        if sub is None:
            raise KeyError(f"unmapped JLC key: {key}")
        path, tf = sub
        return ("decoder", f"layer{t}", f"JLC_{j}") + path, tf
    m = re.fullmatch(r"decoder\.out_conv1\.0\.(weight|bias)", key)
    if m:
        p = m.group(1)
        tf = _conv3d_w if p == "weight" else _identity
        return ("decoder", "out_conv1", wb[p]), tf
    m = re.fullmatch(r"decoder\.out_conv([2-9])\.(weight|bias)", key)
    if m:
        t, p = int(m.group(1)), m.group(2)
        tf = _conv1x1_w if p == "weight" else _identity
        return ("decoder", f"out_conv{t}", wb[p]), tf

    # --- Teacher (reconstruction) decoders ----------------------------------
    m = re.fullmatch(r"rc_decoders\.(\d+)\.enc2rc_(\d+)\.0\.(weight|bias)",
                     key)
    if m:
        mod, k, p = int(m.group(1)), int(m.group(2)), m.group(3)
        tf = _conv1x1_w if p == "weight" else _identity
        return (f"rc_decoder_{mod}", f"enc2rc_{k}", wb[p]), tf
    m = re.fullmatch(r"rc_decoders\.(\d+)\.layer_up(\d+)\.up\.(weight|bias)",
                     key)
    if m:
        mod, t, p = int(m.group(1)), int(m.group(2)), m.group(3)
        tf = _convT_w if p == "weight" else _convT_b
        return (f"rc_decoder_{mod}", f"up{t}", "Dense_0", wb[p]), tf
    m = re.fullmatch(r"rc_decoders\.(\d+)\.layer(\d+)\.(\d+)\.(.+)", key)
    if m:
        mod, t, j, rest = (int(m.group(1)), int(m.group(2)), int(m.group(3)),
                           m.group(4))
        sub = _jlc_subkey(rest)
        if sub is None:
            raise KeyError(f"unmapped JLC key: {key}")
        path, tf = sub
        return (f"rc_decoder_{mod}", f"layer{t}", f"JLC_{j}") + path, tf
    m = re.fullmatch(r"rc_decoders\.(\d+)\.out_conv\.0\.(weight|bias)", key)
    if m:
        mod, p = int(m.group(1)), m.group(2)
        tf = _conv3d_w if p == "weight" else _identity
        return (f"rc_decoder_{mod}", "out_conv", wb[p]), tf

    raise KeyError(f"unmapped reference state-dict key: {key}")


# ---------------------------------------------------------------------------
# Public API.
# ---------------------------------------------------------------------------

def convert_state_dict(state_dict: Dict[str, Any],
                       params_template=None) -> Dict[str, Any]:
    """Reference VeloxSeg state dict → nested flax params dict.

    Strips the DDP ``module.`` prefix if present
    (``utils/load_model.py:111-119``). With ``params_template``, the result
    is structure-checked/ordered against the template via flax
    ``from_state_dict`` (raises on any mismatch).
    """
    nested: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        mapped = _map_key(key)
        if mapped is None:
            continue
        path, tf = mapped
        arr = tf(np.asarray(_to_numpy(value), dtype=np.float32))
        node = nested
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    if params_template is not None:
        from flax import serialization
        nested = serialization.from_state_dict(params_template, nested)
    return nested


def _to_numpy(value) -> np.ndarray:
    if hasattr(value, "detach"):  # torch tensor
        return value.detach().cpu().numpy()
    return np.asarray(value)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a ``.pth`` checkpoint and return the model state dict.

    Accepts the reference's wrapped training checkpoint or a bare state
    dict (``utils/inference_petct.py:95-101``).
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model" in payload \
            and not any(k.endswith(".weight") for k in payload):
        payload = payload["model"]
    if hasattr(payload, "state_dict") and not isinstance(payload, dict):
        payload = payload.state_dict()
    return payload


def import_torch_checkpoint(path: str, params_template=None):
    """Load a reference ``.pth`` and map it onto the flax params tree."""
    return convert_state_dict(load_torch_state_dict(path), params_template)
