"""Reference (PyTorch) zoo checkpoints → flax params for parity testing.

Per-model state-dict key maps onto the channels-last flax rewrites in
``models/zoo/``. Currently covered: MedNeXt (``compared_model/MedNeXt``,
the reference's ConvNeXt-style baseline). The layout transforms are shared
with :mod:`.torch_import`:

- Conv3d ``(O, I/g, k, k, k)`` → DHWIO ``(k, k, k, I/g, O)``.
- ConvTranspose3d ``(I, O/g, k, k, k)``: our :class:`zoo.common.
  ConvTranspose3d` flips the kernel internally, so the import only swaps
  to DHWIO — ``(2,3,4,0,1)`` for ``groups=1``, ``(2,3,4,1,0)`` for
  depthwise (``I/g == 1``).
- 1×1 convs (either direction) → Dense ``(I, O)``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .torch_import import _conv1x1_w, _conv3d_w, _identity, _to_numpy


def _convT_dhwio(w: np.ndarray) -> np.ndarray:
    """groups=1 ConvTranspose3d (I, O, kd, kh, kw) → (kd, kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 4, 0, 1))


def _convT_dw_dhwio(w: np.ndarray) -> np.ndarray:
    """Depthwise ConvTranspose3d (C, 1, kd, kh, kw) → (kd, kh, kw, 1, C)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convT_1x1_dense(w: np.ndarray) -> np.ndarray:
    """ConvTranspose3d k=1 s=1 (I, O, 1, 1, 1) → Dense (I, O)."""
    return w.reshape(w.shape[0], w.shape[1])


# ---------------------------------------------------------------------------
# MedNeXt (compared_model/MedNeXt/MedNextV1.py — attribute names at
# :47-273; block internals blocks.py:30-75).
# ---------------------------------------------------------------------------

_MEDNEXT_STAGE = {
    "enc_block_0": "enc0", "enc_block_1": "enc1", "enc_block_2": "enc2",
    "enc_block_3": "enc3", "bottleneck": "bottleneck",
    "dec_block_3": "dec3", "dec_block_2": "dec2", "dec_block_1": "dec1",
    "dec_block_0": "dec0",
}

_MEDNEXT_INNER = {
    # torch attr → (our module name, weight transform)
    "conv1": ("dw", _conv3d_w),            # depthwise k³ (C,1,k,k,k)
    "norm": ("norm", None),                # GroupNorm scale/bias
    "conv2": ("expand", _conv1x1_w),
    "conv3": ("compress", _conv1x1_w),
}


def _mednext_inner(prefix: Tuple[str, ...], rest: str, up: bool
                   ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    m = re.fullmatch(r"(conv1|norm|conv2|conv3)\.(weight|bias)", rest)
    if not m:
        return None
    attr, p = m.group(1), m.group(2)
    name, tf = _MEDNEXT_INNER[attr]
    if attr == "norm":
        return prefix + (name, "scale" if p == "weight" else "bias"), \
            _identity
    if attr == "conv1":
        if up:
            name = "dw_up"
            tf = _convT_dw_dhwio  # depthwise ConvTranspose3d
        return prefix + (name, "kernel" if p == "weight" else "bias"), \
            tf if p == "weight" else _identity
    return prefix + (name, "kernel" if p == "weight" else "bias"), \
        tf if p == "weight" else _identity


def _map_mednext_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    m = re.fullmatch(r"stem\.(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("stem", "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    m = re.fullmatch(r"(enc_block_\d|bottleneck|dec_block_\d)\.(\d+)\.(.+)",
                     key)
    if m:
        stage = _MEDNEXT_STAGE[m.group(1)]
        out = _mednext_inner((f"{stage}_{m.group(2)}",), m.group(3),
                             up=False)
        if out is None:
            raise KeyError(f"unmapped MedNeXt key: {key}")
        return out
    m = re.fullmatch(r"down_(\d)\.(.+)", key)
    if m:
        rest = m.group(2)
        rm = re.fullmatch(r"res_conv\.(weight|bias)", rest)
        if rm:
            p = rm.group(1)
            return (f"down{m.group(1)}", "res",
                    "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        out = _mednext_inner((f"down{m.group(1)}",), rest, up=False)
        if out is None:
            raise KeyError(f"unmapped MedNeXt key: {key}")
        return out
    m = re.fullmatch(r"up_(\d)\.(.+)", key)
    if m:
        rest = m.group(2)
        rm = re.fullmatch(r"res_conv\.(weight|bias)", rest)
        if rm:
            p = rm.group(1)
            return (f"up{m.group(1)}", "res",
                    "kernel" if p == "weight" else "bias"), \
                _convT_dhwio if p == "weight" else _identity
        out = _mednext_inner((f"up{m.group(1)}",), rest, up=True)
        if out is None:
            raise KeyError(f"unmapped MedNeXt key: {key}")
        return out
    m = re.fullmatch(r"out_0\.conv_out\.(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("out", "kernel" if p == "weight" else "bias"), \
            _convT_1x1_dense if p == "weight" else _identity
    if re.match(r"out_[1-4]\.", key) or key.startswith("dummy"):
        return None  # deep-supervision heads (absent for ds=False)
    raise KeyError(f"unmapped MedNeXt key: {key}")


# ---------------------------------------------------------------------------
# SlimUNETR (compared_model/SlimUNETR/ — Encoder.py, Decoder.py,
# Slim_UNETR_Block.py). Parity holds in torch *train* mode with dropout=0:
# our BatchNormNoTrack matches torch BN batch statistics.
# ---------------------------------------------------------------------------

def _slim_qkv_tf(heads: int):
    """qkv 1×1 conv (3C, C, 1, 1, 1) → Dense (C, 3C) with row permutation.

    The reference views the 3C conv channels as (heads, 3·hd) and splits
    per head, so torch row ``h·3hd + s·hd + c`` is our column
    ``s·C + h·hd + c`` (we reshape as (3, heads, hd), "which" slowest).
    """
    def tf(w: np.ndarray) -> np.ndarray:
        three_c = w.shape[0]
        c_total = three_c // 3
        hd = c_total // heads
        w = w.reshape(three_c, -1)  # (3C, C)
        perm = np.empty(three_c, dtype=np.int64)
        for s in range(3):
            for h in range(heads):
                for c in range(hd):
                    perm[s * c_total + h * hd + c] = h * 3 * hd + s * hd + c
        return np.transpose(w[perm])  # (C, 3C)
    return tf


_SLIM_BLOCK_INNER = {
    "patch1.positional_encoding": ("patch1", _conv3d_w),
    "LocalRC.pointwise_conv_0": ("pw0", _conv1x1_w),
    "LocalRC.depthwise_conv": ("dw", _conv3d_w),
    "LocalRC.pointwise_conv_1": ("pw1", _conv1x1_w),
    "LineConv1.line_conv_0": ("lc1_up", _conv1x1_w),
    "LineConv1.line_conv_1": ("lc1_down", _conv1x1_w),
    "patch2.positional_encoding": ("patch2", _conv3d_w),
    "LocalRD.conv_trans": ("diffuse", _convT_dw_dhwio),
    "LocalRD.pointwise_conv": ("pw2", _conv1x1_w),
    "LineConv2.line_conv_0": ("lc2_up", _conv1x1_w),
    "LineConv2.line_conv_1": ("lc2_down", _conv1x1_w),
}

_SLIM_BLOCK_NORMS = {
    "LocalRC.bn1": "bn1", "LocalRC.bn2": "bn2", "LocalRD.norm": "gn",
}


def _map_slim_block(our_block: str, rest: str, heads: int
                    ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    if rest.endswith("num_batches_tracked") or ".running_" in rest:
        return None  # BN running stats: ours uses batch statistics
    m = re.fullmatch(r"(.+)\.(weight|bias)", rest)
    if not m:
        raise KeyError(f"unmapped SlimUNETR block key: {rest}")
    attr, p = m.group(1), m.group(2)
    if attr in _SLIM_BLOCK_NORMS:
        return (our_block, _SLIM_BLOCK_NORMS[attr],
                "scale" if p == "weight" else "bias"), _identity
    if attr == "GlobalST.qkv":
        return (our_block, "qkv", "kernel"), _slim_qkv_tf(heads)
    if attr in _SLIM_BLOCK_INNER:
        name, tf = _SLIM_BLOCK_INNER[attr]
        return (our_block, name, "kernel" if p == "weight" else "bias"), \
            tf if p == "weight" else _identity
    raise KeyError(f"unmapped SlimUNETR block key: {rest}")


def _make_slim_mapper(heads=(1, 2, 4, 4)):
    # reference block{1..4} → our stage index 0..3 (encoder) and, in the
    # decoder, reference block4→dec_block3 … block1→dec_block0.
    def map_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
        m = re.fullmatch(r"Encoder\.DWconv(\d)\.(depth_wise|norm)\."
                         r"(weight|bias)", key)
        if m:
            i = int(m.group(1)) - 1
            p = m.group(3)
            if m.group(2) == "depth_wise":
                return (f"enc_down{i}_conv",
                        "kernel" if p == "weight" else "bias"), \
                    _conv3d_w if p == "weight" else _identity
            return (f"enc_down{i}_gn",
                    "scale" if p == "weight" else "bias"), _identity
        m = re.fullmatch(r"Encoder\.block(\d)\.(\d+)\.(.+)", key)
        if m:
            s = int(m.group(1)) - 1
            return _map_slim_block(f"enc_block{s}_{m.group(2)}",
                                   m.group(3), heads[s])
        if key == "Encoder.position_embeddings":
            return ("position_embeddings",), _identity
        m = re.fullmatch(r"Decoder\.block(\d)\.(\d+)\.(.+)", key)
        if m:
            s = int(m.group(1)) - 1
            return _map_slim_block(f"dec_block{s}_{m.group(2)}",
                                   m.group(3), heads[s])
        m = re.fullmatch(r"Decoder\.(TSconv(\d)|SegHead)\."
                         r"(transposed|norm)\.(weight|bias)", key)
        if m:
            # TSconv1 is the deepest (embed→ch2) = our dec_up3, etc.
            our = ("seg_head" if m.group(1) == "SegHead"
                   else f"dec_up{4 - int(m.group(2))}")
            p = m.group(4)
            if m.group(3) == "transposed":
                return (f"{our}_conv",
                        "kernel" if p == "weight" else "bias"), \
                    _convT_dhwio if p == "weight" else _identity
            return (f"{our}_gn",
                    "scale" if p == "weight" else "bias"), _identity
        raise KeyError(f"unmapped SlimUNETR key: {key}")
    return map_key


# ---------------------------------------------------------------------------
# SegFormer3D (compared_model/SegFormer/SegFormer.py). BatchNorms → torch
# train-mode parity (as SlimUNETR); all dropout rates default 0.
# ---------------------------------------------------------------------------

def _dense_w(w: np.ndarray) -> np.ndarray:
    """nn.Linear (O, I) → Dense (I, O)."""
    return np.transpose(w)


def _map_segformer_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    if key.endswith("num_batches_tracked") or ".running_" in key:
        return None
    m = re.fullmatch(
        r"segformer_encoder\.embed_(\d)\.(patch_embeddings|norm)\."
        r"(weight|bias)", key)
    if m:
        s, p = int(m.group(1)) - 1, m.group(3)
        if m.group(2) == "patch_embeddings":
            return (f"embed_{s}", "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        return (f"embed_norm_{s}", "scale" if p == "weight" else "bias"), \
            _identity
    m = re.fullmatch(r"segformer_encoder\.norm(\d)\.(weight|bias)", key)
    if m:
        s, p = int(m.group(1)) - 1, m.group(2)
        return (f"stage_norm_{s}", "scale" if p == "weight" else "bias"), \
            _identity
    m = re.fullmatch(
        r"segformer_encoder\.tf_block(\d)\.(\d+)\.(.+)\.(weight|bias)", key)
    if m:
        s, i = int(m.group(1)) - 1, m.group(2)
        attr, p = m.group(3), m.group(4)
        blk = f"s{s}_b{i}"
        norm_map = {"norm1": f"{blk}_norm1", "norm2": f"{blk}_norm2",
                    "attention.sr_norm": (f"{blk}_attn", "sr_norm")}
        if attr in ("norm1", "norm2"):
            return (norm_map[attr], "scale" if p == "weight" else "bias"), \
                _identity
        if attr == "attention.sr_norm":
            return (f"{blk}_attn", "sr_norm",
                    "scale" if p == "weight" else "bias"), _identity
        if attr == "attention.sr":
            return (f"{blk}_attn", "sr",
                    "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        dense = {"attention.query": "query",
                 "attention.key_value": "key_value",
                 "attention.proj": "proj",
                 "mlp.fc1": "fc1", "mlp.fc2": "fc2"}
        if attr in dense:
            parent = f"{blk}_attn" if attr.startswith("attention") \
                else f"{blk}_mlp"
            return (parent, dense[attr],
                    "kernel" if p == "weight" else "bias"), \
                _dense_w if p == "weight" else _identity
        if attr == "mlp.dwconv.dwconv":
            return (f"{blk}_mlp", "dwconv",
                    "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        if attr == "mlp.dwconv.bn":
            return (f"{blk}_mlp", "bn",
                    "scale" if p == "weight" else "bias"), _identity
        raise KeyError(f"unmapped SegFormer block key: {key}")
    m = re.fullmatch(
        r"segformer_decoder\.linear_c(\d)\.(proj|bn)\.(weight|bias)", key)
    if m:
        n, p = m.group(1), m.group(3)
        if m.group(2) == "proj":
            return (f"linear_c{n}", "kernel" if p == "weight" else "bias"), \
                _dense_w if p == "weight" else _identity
        return (f"linear_c{n}_norm",
                "scale" if p == "weight" else "bias"), _identity
    if key == "segformer_decoder.linear_fuse.0.weight":
        return ("linear_fuse", "kernel"), _conv1x1_w
    m = re.fullmatch(r"segformer_decoder\.linear_fuse\.1\.(weight|bias)",
                     key)
    if m:
        p = m.group(1)
        return ("fuse_bn", "scale" if p == "weight" else "bias"), _identity
    m = re.fullmatch(r"segformer_decoder\.linear_pred\.(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("linear_pred", "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    raise KeyError(f"unmapped SegFormer key: {key}")


# ---------------------------------------------------------------------------
# HDenseFormer (compared_model/HDense/HDenseFormer.py). InstanceNorms are
# torch-default non-affine in UpConv (no params) and affine in BasicConv3d.
# ---------------------------------------------------------------------------

_HDENSE_UNET = {
    "block_1_1_left": "b11l", "block_1_2_left": "b12l",
    "block_2_1_left": "b21l", "block_2_2_left": "b22l",
    "block_3_1_left": "b31l", "block_3_2_left": "b32l",
    "block_4_1_left": "b41l", "block_4_2_left": "b42l",
    "block_3_1_right": "b31r", "block_3_2_right": "b32r",
    "block_2_1_right": "b21r", "block_2_2_right": "b22r",
    "block_1_1_right": "b11r", "block_1_2_right": "b12r",
}

_HDENSE_HEADS = {"conv1x1": "head", "conv1x1_d1": "head_d1",
                 "conv1x1_d2": "head_d2", "conv1x1_d3": "head_d3"}


def _map_hdense_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    m = re.fullmatch(r"attns\.(\d+)\.(.+)", key)
    if m:
        mod, rest = m.group(1), m.group(2)
        base = (f"attns_{mod}",)
        m2 = re.fullmatch(r"patch_embeddings\.(weight|bias)", rest)
        if m2:
            p = m2.group(1)
            return base + ("patch_embed",
                           "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        if rest == "position_embeddings":
            return base + ("pos_embed",), _identity
        m2 = re.fullmatch(r"blocks\.(\d+)\.0\.(.+)", rest)
        if m2:
            blk, inner = f"block_{m2.group(1)}", m2.group(2)
            m3 = re.fullmatch(r"layers\.(\d+)\.(\d)\.(.+)", inner)
            if m3:
                j, slot, tail = m3.group(1), m3.group(2), m3.group(3)
                if slot == "0":  # the dense-reduce Linear
                    p = tail
                    return base + (blk, f"reduce_{j}",
                                   "kernel" if p == "weight" else "bias"), \
                        _dense_w if p == "weight" else _identity
                prenorm = "attn" if slot == "1" else "ff"
                m4 = re.fullmatch(r"norm\.(weight|bias)", tail)
                if m4:
                    p = m4.group(1)
                    return base + (blk, f"{prenorm}_norm_{j}",
                                   "scale" if p == "weight" else "bias"), \
                        _identity
                if tail == "fn.to_qkv.weight":
                    return base + (blk, f"attn_{j}", "to_qkv", "kernel"), \
                        _dense_w
                m4 = re.fullmatch(r"fn\.to_out\.0\.(weight|bias)", tail)
                if m4:
                    p = m4.group(1)
                    return base + (blk, f"attn_{j}", "to_out",
                                   "kernel" if p == "weight" else "bias"), \
                        _dense_w if p == "weight" else _identity
                m4 = re.fullmatch(r"fn\.net\.([03])\.(weight|bias)", tail)
                if m4:
                    fc = "fc1" if m4.group(1) == "0" else "fc2"
                    p = m4.group(2)
                    return base + (blk, f"ff_{j}", fc,
                                   "kernel" if p == "weight" else "bias"), \
                        _dense_w if p == "weight" else _identity
            m3 = re.fullmatch(r"out_layer\.net\.([03])\.(weight|bias)",
                              inner)
            if m3:
                fc = "fc1" if m3.group(1) == "0" else "fc2"
                p = m3.group(2)
                return base + (blk, "out_layer", fc,
                               "kernel" if p == "weight" else "bias"), \
                    _dense_w if p == "weight" else _identity
        raise KeyError(f"unmapped HDense key: {key}")
    m = re.fullmatch(r"(deep_conv|up1|up2|up3)\.double_conv\.0\."
                     r"(weight|bias)", key)
    if m:
        p = m.group(2)
        return (m.group(1), "conv", "kernel" if p == "weight" else "bias"), \
            _conv3d_w if p == "weight" else _identity
    m = re.fullmatch(r"(block_\d_\d_(?:left|right))\.(conv|norm)\."
                     r"(weight|bias)", key)
    if m:
        our, p = _HDENSE_UNET[m.group(1)], m.group(3)
        if m.group(2) == "conv":
            return (our, "conv", "kernel"), _conv3d_w
        return (our, "norm", "scale" if p == "weight" else "bias"), \
            _identity
    m = re.fullmatch(r"upconv_(\d)\.(weight|bias)", key)
    if m:
        p = m.group(2)
        return (f"upconv{m.group(1)}",
                "kernel" if p == "weight" else "bias"), \
            _convT_dhwio if p == "weight" else _identity
    m = re.fullmatch(r"(conv1x1(?:_d\d)?)\.(weight|bias)", key)
    if m:
        p = m.group(2)
        return (_HDENSE_HEADS[m.group(1)],
                "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    raise KeyError(f"unmapped HDense key: {key}")


# ---------------------------------------------------------------------------
# NestedFormer (compared_model/NestedFormer/medical/model/). InstanceNorms
# in the conv path are torch-default non-affine (no params).
# ---------------------------------------------------------------------------

def _global_pool_w(w: np.ndarray) -> np.ndarray:
    """GlobalPool nn.Linear(1, all_size) weight (all, 1) → (all,)."""
    return w[:, 0]


def _twoconv(prefix: Tuple[str, ...], rest: str
             ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    m = re.fullmatch(r"conv_([12])\.conv_1\.0\.(weight|bias)", rest)
    if not m:
        return None
    idx = int(m.group(1)) - 1
    p = m.group(2)
    return prefix + (f"conv{idx}", "kernel" if p == "weight" else "bias"), \
        _conv3d_w if p == "weight" else _identity


def _nf_mha(our: Tuple[str, ...], attr: str, p: str):
    qkvo = {"query": "q", "key": "k", "value": "v", "out": "out"}
    return our + (qkvo[attr], "kernel" if p == "weight" else "bias"), \
        _dense_w if p == "weight" else _identity


def _map_nestedformer_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    ln = lambda p: "scale" if p == "weight" else "bias"  # noqa: E731

    m = re.fullmatch(r"encoder\.encoders\.(\d+)\.conv_0\.(.+)", key)
    if m:
        out = _twoconv((f"enc{m.group(1)}_conv0",), m.group(2))
        if out is None:
            raise KeyError(f"unmapped NestedFormer key: {key}")
        return out
    m = re.fullmatch(r"encoder\.encoders\.(\d+)\.down_(\d)\.(.+)", key)
    if m:
        base = (f"enc{m.group(1)}_down{m.group(2)}",)
        rest = m.group(3)
        m2 = re.fullmatch(r"embeddings\.patch_embeddings\.(weight|bias)",
                          rest)
        if m2:
            p = m2.group(1)
            return base + ("embed", "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        m2 = re.fullmatch(r"embeddings\.norm\.(weight|bias)", rest)
        if m2:
            return base + ("embed_norm", m2.group(1)), _identity
        m2 = re.fullmatch(r"block_list\.(\d+)\.(.+)", rest)
        if m2:
            blk = base + (f"block{m2.group(1)}",)
            inner = m2.group(2)
            m3 = re.fullmatch(r"(attention|ffn)_norm\.(weight|bias)", inner)
            if m3:
                which = "attn_norm" if m3.group(1) == "attention" \
                    else "ffn_norm"
                return blk + (which, m3.group(2)), _identity
            m3 = re.fullmatch(r"ffn\.fc([12])\.(weight|bias)", inner)
            if m3:
                p = m3.group(2)
                return blk + (f"fc{m3.group(1)}",
                              "kernel" if p == "weight" else "bias"), \
                    _conv1x1_w if p == "weight" else _identity
            m3 = re.fullmatch(r"attn\.global_layer\.(weight|bias)", inner)
            if m3:
                p = m3.group(1)
                return blk + (("global_w",) if p == "weight"
                              else ("global_b",)), \
                    _global_pool_w if p == "weight" else _identity
        raise KeyError(f"unmapped NestedFormer key: {key}")

    m = re.fullmatch(r"fusion\.spatial_att\.embeddings\.patch_embeddings\."
                     r"(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("spatial_embed", "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    m = re.fullmatch(r"fusion\.spatial_att\.block_list\.(\d+)\.(.+)", key)
    if m:
        blk = (f"spatial_block{m.group(1)}",)
        rest = m.group(2)
        m2 = re.fullmatch(r"(attention|ffn)_norm\.(weight|bias)", rest)
        if m2:
            which = "attn_norm" if m2.group(1) == "attention" else "ffn_norm"
            return blk + (which, ln(m2.group(2))), _identity
        m2 = re.fullmatch(r"ffn\.fc([12])\.(weight|bias)", rest)
        if m2:
            p = m2.group(2)
            return blk + (f"fc{m2.group(1)}",
                          "kernel" if p == "weight" else "bias"), \
                _dense_w if p == "weight" else _identity
        m2 = re.fullmatch(r"attn\.([vh])_attention\.(query|key|value|out)\."
                          r"(weight|bias)", rest)
        if m2:
            return _nf_mha(blk + (f"{m2.group(1)}_attn",), m2.group(2),
                           m2.group(3))
        m2 = re.fullmatch(r"attn\.window_attention\.to_(qkv|out)\."
                          r"(weight|bias)", rest)
        if m2:
            p = m2.group(2)
            return blk + ("win_attn", f"to_{m2.group(1)}",
                          "kernel" if p == "weight" else "bias"), \
                _dense_w if p == "weight" else _identity
        if rest == "attn.window_attention.pos_embedding":
            return blk + ("win_attn", "pos_embedding"), _identity
        m2 = re.fullmatch(r"attn\.pos_embedding_([12])\.position_embeddings",
                          rest)
        if m2:
            return blk + (f"pos{m2.group(1)}",), _identity
        raise KeyError(f"unmapped NestedFormer key: {key}")

    m = re.fullmatch(r"fusion\.modality_att\.embeddings\.(\d+)\.(.+)", key)
    if m:
        mod, rest = m.group(1), m.group(2)
        m2 = re.fullmatch(r"patch_embeddings\.(weight|bias)", rest)
        if m2:
            p = m2.group(1)
            return (f"cm_embed{mod}",
                    "kernel" if p == "weight" else "bias"), \
                _conv1x1_w if p == "weight" else _identity
        if rest == "position_embeddings":
            return (f"cm_pos{mod}",), _identity
        raise KeyError(f"unmapped NestedFormer key: {key}")
    m = re.fullmatch(r"fusion\.modality_att\.token_mixer\.token_conv\."
                     r"(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("token_learner", "token_conv",
                "kernel" if p == "weight" else "bias"), \
            _conv3d_w if p == "weight" else _identity
    if re.fullmatch(
            r"fusion\.modality_att\.cross_attention\.attention_norm\."
            r"(weight|bias)", key):
        return None  # defined but unused in the reference forward
    m = re.fullmatch(r"fusion\.modality_att\.cross_attention\."
                     r"attention_norm_cross\.(weight|bias)", key)
    if m:
        return ("cross_norm", ln(m.group(1))), _identity
    m = re.fullmatch(r"fusion\.modality_att\.cross_attention\.ffn_norm\."
                     r"(weight|bias)", key)
    if m:
        return ("cm_ffn_norm", ln(m.group(1))), _identity
    m = re.fullmatch(r"fusion\.modality_att\.cross_attention\.ffn\."
                     r"fc([12])\.(weight|bias)", key)
    if m:
        p = m.group(2)
        return (f"cm_fc{m.group(1)}",
                "kernel" if p == "weight" else "bias"), \
            _dense_w if p == "weight" else _identity
    m = re.fullmatch(r"fusion\.modality_att\.cross_attention\.attn_cross\."
                     r"(query|key|value|out)\.(weight|bias)", key)
    if m:
        return _nf_mha(("cross_attn",), m.group(1), m.group(2))

    m = re.fullmatch(r"fusion_conv_(\d)\.(.+)", key)
    if m:
        out = _twoconv((f"fusion_conv_{m.group(1)}",), m.group(2))
        if out is None:
            raise KeyError(f"unmapped NestedFormer key: {key}")
        return out
    m = re.fullmatch(r"upcat_(\d)\.upsample\.(weight|bias)", key)
    if m:
        p = m.group(2)
        return (f"upcat_{m.group(1)}_up",
                "kernel" if p == "weight" else "bias"), \
            _convT_dhwio if p == "weight" else _identity
    m = re.fullmatch(r"upcat_(\d)\.convs\.(.+)", key)
    if m:
        out = _twoconv((f"upcat_{m.group(1)}_convs",), m.group(2))
        if out is None:
            raise KeyError(f"unmapped NestedFormer key: {key}")
        return out
    m = re.fullmatch(r"final_conv\.(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("final_conv", "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    raise KeyError(f"unmapped NestedFormer key: {key}")


# ---------------------------------------------------------------------------
# UNETR++ (compared_model/unetr_pp/network_architecture/tumor/). The
# "instance" UnetResBlocks carry no norm params (monai affine=False);
# "batch" norms map scale/bias and drop running stats.
# ---------------------------------------------------------------------------

def _upp_resblock(prefix: Tuple[str, ...], rest: str
                  ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    if rest.endswith("num_batches_tracked") or ".running_" in rest:
        return None
    m = re.fullmatch(r"conv([123])\.conv\.weight", rest)
    if m:
        return prefix + (f"conv{m.group(1)}", "kernel"), _conv3d_w
    m = re.fullmatch(r"norm([123])\.(weight|bias)", rest)
    if m:
        p = m.group(2)
        return prefix + (f"norm{m.group(1)}",
                         "scale" if p == "weight" else "bias"), _identity
    raise KeyError(f"unmapped UNETR++ resblock key: {rest}")


def _upp_tblock(prefix: Tuple[str, ...], rest: str
                ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    m = re.fullmatch(r"norm\.(weight|bias)", rest)
    if m:
        p = m.group(1)
        return prefix + ("norm", "scale" if p == "weight" else "bias"), \
            _identity
    if rest == "gamma":
        return prefix + ("gamma",), _identity
    if rest == "pos_embed":
        return prefix + ("pos_embed",), _identity
    if rest == "epa_block.qkvv.weight":
        return prefix + ("epa", "qkvv", "kernel"), _dense_w
    m = re.fullmatch(r"epa_block\.(EF|temperature2?)", rest)
    if m:
        return prefix + ("epa", m.group(1)), _identity
    m = re.fullmatch(r"conv51\.(.+)", rest)
    if m:
        return _upp_resblock(prefix + ("conv51",), m.group(1))
    m = re.fullmatch(r"conv8\.1\.(weight|bias)", rest)
    if m:
        p = m.group(1)
        # ours is a Conv3d module (kernel (1,1,1,C,C)), not a Dense
        return prefix + ("conv8", "kernel" if p == "weight" else "bias"), \
            _conv3d_w if p == "weight" else _identity
    raise KeyError(f"unmapped UNETR++ transformer key: {rest}")


def _map_unetrpp_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    m = re.fullmatch(r"unetr_pp_encoder\.downsample_layers\.(\d)\.(0\.conv|1)"
                     r"\.(weight|bias)", key)
    if m:
        i, p = int(m.group(1)), m.group(3)
        our = "stem" if i == 0 else f"down{i}"
        if m.group(2) == "0.conv":
            return (f"{our}_conv", "kernel"), _conv3d_w
        return (f"{our}_norm", "scale" if p == "weight" else "bias"), \
            _identity
    m = re.fullmatch(r"unetr_pp_encoder\.stages\.(\d)\.(\d+)\.(.+)", key)
    if m:
        return _upp_tblock((f"stage{m.group(1)}_block{m.group(2)}",),
                           m.group(3))
    m = re.fullmatch(r"encoder1\.(.+)", key)
    if m:
        return _upp_resblock(("encoder1",), m.group(1))
    m = re.fullmatch(r"decoder([2-5])\.transp_conv\.conv\.weight", key)
    if m:
        return (f"decoder{m.group(1)}_up", "kernel"), _convT_dhwio
    m = re.fullmatch(r"decoder([345])\.decoder_block\.0\.(\d+)\.(.+)", key)
    if m:
        return _upp_tblock(
            (f"decoder{m.group(1)}_block{m.group(2)}",), m.group(3))
    # conv_decoder appends the UnetResBlock directly (no Sequential)
    m = re.fullmatch(r"decoder2\.decoder_block\.0\.(.+)", key)
    if m:
        return _upp_resblock(("decoder2_conv",), m.group(1))
    m = re.fullmatch(r"out([123])\.conv\.conv\.(weight|bias)", key)
    if m:
        p = m.group(2)
        return (f"out{m.group(1)}",
                "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    raise KeyError(f"unmapped UNETR++ key: {key}")


# ---------------------------------------------------------------------------
# A2FSeg (compared_model/A2FSeg/.../generic_MAML3_channel.py; the config
# sets convolutional_pooling/upsampling=True and dropout p=0). BatchNorms
# → torch train-mode parity. The fusion Generic_UNet_Decoder registers
# conv_blocks_context/td modules it never uses in forward — skipped.
# ---------------------------------------------------------------------------

def _a2f_stacked(prefix: Tuple[str, ...], rest: str
                 ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    """One ConvDropoutNormNonlin: ``blocks.{i}.(conv|instnorm).*``."""
    if rest.endswith("num_batches_tracked") or ".running_" in rest:
        return None
    m = re.fullmatch(r"(conv|instnorm)\.(weight|bias)", rest)
    if not m:
        raise KeyError(f"unmapped A2FSeg conv-block key: {rest}")
    p = m.group(2)
    if m.group(1) == "conv":
        return prefix + ("conv", "kernel" if p == "weight" else "bias"), \
            _conv3d_w if p == "weight" else _identity
    return prefix + ("norm", "scale" if p == "weight" else "bias"), \
        _identity


def _a2f_unet(enc: str, dec: str, rest: str
              ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    m = re.fullmatch(r"conv_blocks_context\.(\d)\.blocks\.([01])\.(.+)",
                     rest)
    if m and int(m.group(1)) < 5:
        ab = "a" if m.group(2) == "0" else "b"
        return _a2f_stacked((enc, f"ctx{m.group(1)}_{ab}"), m.group(3))
    m = re.fullmatch(r"conv_blocks_context\.5\.([01])\.blocks\.0\.(.+)",
                     rest)
    if m:
        ab = "a" if m.group(1) == "0" else "b"
        return _a2f_stacked((enc, f"bottleneck_{ab}"), m.group(2))
    m = re.fullmatch(r"tu\.(\d)\.weight", rest)
    if m:
        return (dec, f"tu{m.group(1)}", "kernel"), _convT_dhwio
    m = re.fullmatch(r"conv_blocks_localization\.(\d)\.([01])\.blocks\.0\."
                     r"(.+)", rest)
    if m:
        ab = "a" if m.group(2) == "0" else "b"
        return _a2f_stacked((dec, f"loc{m.group(1)}_{ab}"), m.group(3))
    m = re.fullmatch(r"seg_outputs\.(\d)\.weight", rest)
    if m:
        return (dec, f"seg{m.group(1)}", "kernel"), _conv1x1_w
    raise KeyError(f"unmapped A2FSeg unet key: {rest}")


def _map_a2fseg_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    if key.endswith("num_batches_tracked") or ".running_" in key:
        return None
    m = re.fullmatch(r"modality_specific_models\.(\d+)\.(.+)", key)
    if m:
        mod = m.group(1)
        return _a2f_unet(f"enc{mod}", f"dec{mod}", m.group(2))
    m = re.fullmatch(r"fusion_decoder\.(.+)", key)
    if m:
        rest = m.group(1)
        if rest.startswith("conv_blocks_context.") or \
                rest.startswith("td."):
            return None  # registered but unused in the fusion forward
        m2 = re.fullmatch(r"tu\.(\d)\.weight", rest)
        if m2:
            return (f"fusion_tu{m2.group(1)}", "kernel"), _convT_dhwio
        m2 = re.fullmatch(r"conv_blocks_localization\.(\d)\.([01])\."
                          r"blocks\.0\.(.+)", rest)
        if m2:
            ab = "a" if m2.group(2) == "0" else "b"
            return _a2f_stacked((f"fusion_loc{m2.group(1)}_{ab}",),
                                m2.group(3))
        m2 = re.fullmatch(r"seg_outputs\.(\d)\.weight", rest)
        if m2:
            return (f"fusion_seg{m2.group(1)}", "kernel"), _conv1x1_w
        raise KeyError(f"unmapped A2FSeg fusion key: {key}")
    m = re.fullmatch(r"modality_aware_modules\.(\d+)\.([013])\."
                     r"(weight|bias)", key)
    if m:
        mod, slot, p = m.group(1), m.group(2), m.group(3)
        if slot == "0":
            return (f"aware{mod}_a", "conv",
                    "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        if slot == "1":
            return (f"aware{mod}_a", "norm",
                    "scale" if p == "weight" else "bias"), _identity
        return (f"aware{mod}_b",
                "kernel" if p == "weight" else "bias"), \
            _conv3d_w if p == "weight" else _identity
    m = re.fullmatch(r"lastconv\.0\.([01])\.(weight|bias)", key)
    if m:
        slot, p = m.group(1), m.group(2)
        if slot == "0":
            return ("lastconv", "conv",
                    "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        return ("lastconv", "norm",
                "scale" if p == "weight" else "bias"), _identity
    if key == "output.weight":
        return ("output", "kernel"), _conv1x1_w
    raise KeyError(f"unmapped A2FSeg key: {key}")


# ---------------------------------------------------------------------------
# SuperLightNet (compared_model/SuperLightNet/superlightnet.py,
# ``NormalU_Net``). InstanceNorms are non-affine (no params); GHPA runs on
# 2-D folded slices → 2-D/1-D conv layout transforms.
# ---------------------------------------------------------------------------

def _conv2d_w(w: np.ndarray) -> np.ndarray:
    """Conv2d (O, I/g, kh, kw) → flax (kh, kw, I/g, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d_w(w: np.ndarray) -> np.ndarray:
    """Conv1d (O, I/g, k) → flax (k, I/g, O)."""
    return np.transpose(w, (2, 1, 0))


def _conv2d_1x1_dense(w: np.ndarray) -> np.ndarray:
    """Conv2d 1×1 (O, I, 1, 1) → Dense (I, O)."""
    return np.transpose(w.reshape(w.shape[0], w.shape[1]))


_SLN_GHPA = {
    "conv_xy.0": ("conv_xy_dw", _conv2d_w),
    "conv_xy.2": ("conv_xy_pw", _conv2d_1x1_dense),
    "conv_zx.0": ("conv_zx_dw", _conv1d_w),
    "conv_zx.2": ("conv_zx_pw", _conv2d_1x1_dense),
    "conv_zy.0": ("conv_zy_dw", _conv1d_w),
    "conv_zy.2": ("conv_zy_pw", _conv2d_1x1_dense),
    "dw.0": ("dw_pw", _conv2d_1x1_dense),
    "dw.2": ("dw_dw", _conv2d_w),
    "ldw.0": ("ldw_dw", _conv2d_w),
    "ldw.2": ("ldw_pw", _conv2d_1x1_dense),
}


def _map_sln_thpa(prefix: Tuple[str, ...], rest: str
                  ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    m = re.fullmatch(r"mlp\.fc([12])\.(weight|bias)", rest)
    if m:
        p = m.group(2)
        return prefix + (f"mlp_fc{m.group(1)}",
                         "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    m = re.fullmatch(r"GHPA_dim\.(.+)", rest)
    if m:
        inner = m.group(1)
        g = prefix + ("ghpa",)
        if inner == "params_xy":        # (1, c, x, y) → (1, x, y, c)
            return g + ("params_xy",), \
                lambda w: np.transpose(w, (0, 2, 3, 1))
        if inner in ("params_zx", "params_zy"):  # (1,1,c,n) → (1,n,c)
            return g + (inner,), \
                lambda w: np.transpose(w[0], (0, 2, 1))
        m2 = re.fullmatch(r"norm([12])\.(weight|bias)", inner)
        if m2:
            p = m2.group(2)
            return g + (f"norm{m2.group(1)}",
                        "scale" if p == "weight" else "bias"), _identity
        m2 = re.fullmatch(r"((?:conv_xy|conv_zx|conv_zy|dw|ldw)\.[02])\."
                          r"(weight|bias)", inner)
        if m2:
            name, tf = _SLN_GHPA[m2.group(1)]
            p = m2.group(2)
            return g + (name, "kernel" if p == "weight" else "bias"), \
                tf if p == "weight" else _identity
    raise KeyError(f"unmapped SuperLightNet THPA key: {rest}")


def _map_superlightnet_key(key: str
                           ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    m = re.fullmatch(r"ParallelU_Net_enc_m\.stem\.(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("stem", "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    m = re.fullmatch(r"ParallelU_Net_enc_m\.repr_block_(\d)\.(\d+)\.(.+)",
                     key)
    if m:
        return _map_sln_thpa((f"repr{m.group(1)}_{m.group(2)}",),
                             m.group(3))
    m = re.fullmatch(r"ParallelU_Net_enc_m\.emb_block\.(\d+)\.(.+)", key)
    if m:
        return _map_sln_thpa((f"emb_{m.group(1)}",), m.group(2))
    m = re.fullmatch(r"ParallelU_Net_enc_m\.dwn_block_(\d)\.proj\."
                     r"(weight|bias)", key)
    if m:
        p = m.group(2)
        return (f"down{m.group(1)}",
                "kernel" if p == "weight" else "bias"), \
            _conv3d_w if p == "weight" else _identity
    m = re.fullmatch(r"ParallelU_Net_dec_m\.repr_block_up_(\d)\.(.+)", key)
    if m:
        up = f"up{m.group(1)}"
        rest = m.group(2)
        if rest == "upc.conv.weight":
            return (up, "upc", "kernel"), _conv1x1_w
        if rest == "repr_mldw.0.conv.weight":
            return (up, "mldw_conv", "kernel"), _conv3d_w
        if rest == "repr_mldw.2.conv.weight":
            return (up, "mldw_pw", "kernel"), _conv1x1_w
        if rest == "group_skip_scale":     # (1, C, 1, 1, 1) → (C,)
            return (up, "skip_scale"), lambda w: w.reshape(-1)
        if rest == "group_res_scale":
            return (up, "res_scale"), _identity
        raise KeyError(f"unmapped SuperLightNet key: {key}")
    m = re.fullmatch(r"norm\.(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("head_norm", "scale" if p == "weight" else "bias"), \
            _identity
    m = re.fullmatch(r"proj\.fc([12])\.(weight|bias)", key)
    if m:
        p = m.group(2)
        return (f"head_fc{m.group(1)}",
                "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    raise KeyError(f"unmapped SuperLightNet key: {key}")


# ---------------------------------------------------------------------------
# VSmTrans (compared_model/VSmTrans/VSmTrans.py, ``VSmixTUnet``). All
# dropout rates default 0; BatchNorm in the conv branch → torch train-mode
# parity. ``out_4`` is registered but unused in forward — skipped.
# ---------------------------------------------------------------------------

def _map_vsm_block(prefix: Tuple[str, ...], rest: str
                   ) -> Optional[Tuple[Tuple[str, ...], Any]]:
    if rest.endswith("num_batches_tracked") or ".running_" in rest or \
            rest.endswith("relative_position_index"):
        return None
    ln = lambda p: "scale" if p == "weight" else "bias"  # noqa: E731
    m = re.fullmatch(r"(norm[12])\.(weight|bias)", rest)
    if m:
        return prefix + (m.group(1), ln(m.group(2))), _identity
    m = re.fullmatch(r"mlp\.fc([12])\.(weight|bias)", rest)
    if m:
        p = m.group(2)
        return prefix + (f"fc{m.group(1)}",
                         "kernel" if p == "weight" else "bias"), \
            _dense_w if p == "weight" else _identity
    m = re.fullmatch(r"attn\.(.+)", rest)
    if m:
        inner = m.group(1)
        a = prefix + ("attn",)
        m2 = re.fullmatch(r"(qkv|conv1|proj)\.(weight|bias)", inner)
        if m2:
            p = m2.group(2)
            return a + (m2.group(1),
                        "kernel" if p == "weight" else "bias"), \
                _dense_w if p == "weight" else _identity
        m2 = re.fullmatch(r"norm1\.(weight|bias)", inner)
        if m2:
            return a + ("conv_norm1", ln(m2.group(1))), _identity
        m2 = re.fullmatch(r"norm2\.(weight|bias)", inner)
        if m2:  # BatchNorm3d
            return a + ("conv_norm2", ln(m2.group(1))), _identity
        m2 = re.fullmatch(r"dep_conv\.(weight|bias)", inner)
        if m2:
            p = m2.group(1)
            return a + ("dep_conv",
                        "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        m2 = re.fullmatch(
            r"attns\.(\d)\.relative_position_bias_table", inner)
        if m2:
            return a + (f"attn{m2.group(1)}", "rpb", "table"), _identity
        if inner in ("rate1", "rate2"):
            return a + (inner,), _identity
    raise KeyError(f"unmapped VSmTrans block key: {rest}")


def _map_vsmtrans_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    ln = lambda p: "scale" if p == "weight" else "bias"  # noqa: E731
    m = re.fullmatch(r"VSmViT\.patch_embed\.(proj|norm)\.(weight|bias)",
                     key)
    if m:
        p = m.group(2)
        if m.group(1) == "proj":
            return ("patch_embed",
                    "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        return ("patch_norm", ln(p)), _identity
    m = re.fullmatch(r"VSmViT\.layers(\d)\.0\.blocks\.(\d+)\.(.+)", key)
    if m:
        return _map_vsm_block(
            (f"stage{int(m.group(1)) - 1}_block{m.group(2)}",), m.group(3))
    m = re.fullmatch(r"VSmViT\.layers(\d)\.1\.(norm|reduction)\."
                     r"(weight|bias)", key)
    if m:
        mg = f"merge{int(m.group(1)) - 1}"
        p = m.group(3)
        if m.group(2) == "norm":
            return (mg, "norm", ln(p)), _identity
        return (mg, "reduction", "kernel"), _dense_w
    m = re.fullmatch(r"encoder(\d)\.layer\.conv([123])\.conv\.weight", key)
    if m:
        return (f"encoder{m.group(1)}", f"conv{m.group(2)}", "kernel"), \
            _conv3d_w
    m = re.fullmatch(r"decoder(\d)\.transp_conv\.conv\.weight", key)
    if m:
        return (f"decoder{m.group(1)}_deconv", "kernel"), _convT_dhwio
    m = re.fullmatch(r"decoder(\d)\.conv_block\.conv([123])\.conv\.weight",
                     key)
    if m:
        return (f"decoder{m.group(1)}_conv", f"conv{m.group(2)}",
                "kernel"), _conv3d_w
    m = re.fullmatch(r"out\.conv\.conv\.(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("out", "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    m = re.fullmatch(r"out_([0-3])\.(weight|bias)", key)
    if m:
        p = m.group(2)
        return (f"out_{m.group(1)}",
                "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    if re.fullmatch(r"out_4\.(weight|bias)", key):
        return None  # defined but unused in the reference forward
    raise KeyError(f"unmapped VSmTrans key: {key}")



# ---------------------------------------------------------------------------
# U-KAN (compared_model/UKAN/archs.py:239). Conv/BN double-conv stages,
# overlapping patch embeds, KAN blocks (KANLinear + depthwise conv+BN).
# BN running stats are dropped (our BatchNormNoTrack uses batch stats —
# parity tests run the reference in train() mode); KANLinear ``grid`` is a
# constant buffer, recomputed on our side.
# ---------------------------------------------------------------------------


def _dense_from_1x1(w: np.ndarray) -> np.ndarray:
    """Conv3d k=1 (O, I, 1, 1, 1) → Dense (I, O)."""
    return np.transpose(w.reshape(w.shape[0], w.shape[1]))


def _map_ukan_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    if key.endswith("num_batches_tracked") or ".running_" in key \
            or key.endswith(".grid"):
        return None
    # encoder/decoder double convs: conv.{0,3}=convs, conv.{1,4}=BNs
    m = re.fullmatch(r"(encoder|decoder)(\d)\.conv\.([0134])\.(weight|bias)",
                     key)
    if m:
        mod = f"{m.group(1)}{m.group(2)}"
        idx, p = m.group(3), m.group(4)
        sub = {"0": "conv1", "1": "bn1", "3": "conv2", "4": "bn2"}[idx]
        if sub.startswith("conv"):
            return (mod, sub, "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        return (mod, sub, "scale" if p == "weight" else "bias"), _identity
    # top-level LayerNorms
    m = re.fullmatch(r"(d?norm[34])\.(weight|bias)", key)
    if m:
        return (m.group(1), "scale" if m.group(2) == "weight" else "bias"), \
            _identity
    # patch embeds
    m = re.fullmatch(r"patch_embed([34])\.(proj|norm)\.(weight|bias)", key)
    if m:
        mod, p = f"patch_embed{m.group(1)}", m.group(3)
        if m.group(2) == "proj":
            return (mod, "proj", "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        return (mod, "norm", "scale" if p == "weight" else "bias"), \
            _identity
    # KAN blocks (single block per ModuleList in the reference)
    m = re.fullmatch(r"(d?block[12])\.0\.(.+)", key)
    if m:
        blk, rest = m.group(1), m.group(2)
        m2 = re.fullmatch(r"norm2\.(weight|bias)", rest)
        if m2:
            return (blk, "norm",
                    "scale" if m2.group(1) == "weight" else "bias"), \
                _identity
        m2 = re.fullmatch(
            r"layer\.fc(\d)\.(base_weight|spline_weight|spline_scaler)",
            rest)
        if m2:
            tf = {"base_weight": _dense_w,
                  "spline_scaler": _dense_w,
                  "spline_weight":
                      lambda w: np.transpose(w, (1, 2, 0))}[m2.group(2)]
            return (blk, f"fc{m2.group(1)}", m2.group(2)), tf
        m2 = re.fullmatch(r"layer\.dwconv_(\d)\.(dwconv|bn)\.(weight|bias)",
                          rest)
        if m2:
            j, p = m2.group(1), m2.group(3)
            if m2.group(2) == "dwconv":
                return (blk, f"dw{j}", "dw",
                        "kernel" if p == "weight" else "bias"), \
                    _conv3d_w if p == "weight" else _identity
            return (blk, f"dw{j}", "bn",
                    "scale" if p == "weight" else "bias"), _identity
        raise KeyError(f"unmapped U-KAN block key: {key}")
    m = re.fullmatch(r"final\.(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("final", "kernel" if p == "weight" else "bias"), \
            _dense_from_1x1 if p == "weight" else _identity
    raise KeyError(f"unmapped U-KAN key: {key}")



# ---------------------------------------------------------------------------
# U-RWKV (compared_model/URWKV/URWKV.py, builder
# v_enc_256_fffse_dec_fusion_rwkv_with2x4_3d:270). Dead parameters the
# forward never touches are dropped: e{1-4}.pwconv (shallow MultiSE defines
# but never calls it), outconv (head is Conv_1x1), and SpaBlockScan's own
# gamma2/ln2 (it uses gamma1/ln1 for all six scans — URWKV.py:385-409).
# ---------------------------------------------------------------------------

_URWKV_DEAD = re.compile(
    r"(e[1-4]\.pwconv\.|outconv\.|"
    r"bx4rwkv\.allinone_spa\.(gamma2$|ln2\.))")


def _mix_flat(w: np.ndarray) -> np.ndarray:
    """(1, 1, C) spatial-mix parameter → (C,)."""
    return w.reshape(-1)


def _map_urwkv_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    if key.endswith("num_batches_tracked") or ".running_" in key:
        return None
    if _URWKV_DEAD.match(key):
        return None
    m = re.fullmatch(r"stem\.([01])\.(weight|bias)", key)
    if m:
        if m.group(1) == "0":
            return ("stem_conv",
                    "kernel" if m.group(2) == "weight" else "bias"), \
                _conv3d_w if m.group(2) == "weight" else _identity
        return ("stem_bn",
                "scale" if m.group(2) == "weight" else "bias"), _identity

    def conv_or_bn(path_conv, path_bn, idx_conv, idx, p):
        if idx == idx_conv:
            return tuple(path_conv) + (
                "kernel" if p == "weight" else "bias",), \
                _conv3d_w if p == "weight" else _identity
        return tuple(path_bn) + ("scale" if p == "weight" else "bias",), \
            _identity

    # shallow MultiSE stages e1-e4
    m = re.fullmatch(r"e([1-4])\.(bn_in_c|dwconv\.dwconv)\.(weight|bias)",
                     key)
    if m:
        e, p = f"e{m.group(1)}", m.group(3)
        if m.group(2) == "bn_in_c":
            return (e, "bn", "scale" if p == "weight" else "bias"), _identity
        return (e, "dwconv", "kernel" if p == "weight" else "bias"), \
            _conv3d_w if p == "weight" else _identity
    m = re.fullmatch(
        r"e([1-4])\.(pwconv_in_in4|pwconv_in4_out)\.conv\.([01])\."
        r"(weight|bias)", key)
    if m:
        e = f"e{m.group(1)}"
        sub = "pw_in4" if m.group(2) == "pwconv_in_in4" else "pw_out"
        return conv_or_bn((e, sub, "conv"), (e, sub, "bn"), "0",
                          m.group(3), m.group(4))
    # deep MultiSE stage e5
    m = re.fullmatch(r"e5\.pwconv([12])\.conv\.([01])\.(weight|bias)", key)
    if m:
        sub = f"pw{m.group(1)}"
        return conv_or_bn(("e5", sub, "conv"), ("e5", sub, "bn"), "0",
                          m.group(2), m.group(3))
    m = re.fullmatch(r"e5\.m\.(\d)\.dwconv\.(weight|bias)", key)
    if m:
        p = m.group(2)
        return ("e5", f"dw_{m.group(1)}",
                "kernel" if p == "weight" else "bias"), \
            _conv3d_w if p == "weight" else _identity
    # RWKV bottleneck
    m = re.fullmatch(r"bx4rwkv\.(gamma2)", key)
    if m:
        return ("bx4rwkv", "gamma2"), _identity
    m = re.fullmatch(r"bx4rwkv\.ln2\.(weight|bias)", key)
    if m:
        return ("bx4rwkv", "ln2",
                "scale" if m.group(1) == "weight" else "bias"), _identity
    m = re.fullmatch(r"bx4rwkv\.allinone_spa\.(gamma1)", key)
    if m:
        return ("bx4rwkv", "gamma1"), _identity
    m = re.fullmatch(r"bx4rwkv\.allinone_spa\.ln1\.(weight|bias)", key)
    if m:
        return ("bx4rwkv", "ln1",
                "scale" if m.group(1) == "weight" else "bias"), _identity
    m = re.fullmatch(
        r"bx4rwkv\.(allinone_spa|ffn)\."
        r"(spatial_decay|spatial_first|spatial_mix_[kvr])", key)
    if m:
        mod = "spa_mix" if m.group(1) == "allinone_spa" else "ffn"
        tf = _mix_flat if "mix" in m.group(2) else _identity
        return ("bx4rwkv", mod, m.group(2)), tf
    m = re.fullmatch(
        r"bx4rwkv\.(allinone_spa|ffn)\.(key|value|receptance|output)\."
        r"weight", key)
    if m:
        mod = "spa_mix" if m.group(1) == "allinone_spa" else "ffn"
        return ("bx4rwkv", mod, m.group(2), "kernel"), _dense_w
    m = re.fullmatch(
        r"bx4rwkv\.(allinone_spa|ffn)\.key_norm\.(weight|bias)", key)
    if m:
        mod = "spa_mix" if m.group(1) == "allinone_spa" else "ffn"
        return ("bx4rwkv", mod, "key_norm",
                "scale" if m.group(2) == "weight" else "bias"), _identity
    # decoder
    m = re.fullmatch(r"Up([2-5])\.up\.([12])\.(weight|bias)", key)
    if m:
        up = f"up{m.group(1)}"
        return conv_or_bn((up, "conv"), (up, "bn"), "1",
                          m.group(2), m.group(3))
    m = re.fullmatch(r"Up_conv([2-5])\.conv\.([02356 8]|\d)\.(weight|bias)",
                     key)
    if m:
        upc = f"upc{m.group(1)}"
        idx, p = m.group(2), m.group(3)
        sub = {"0": ("conv1", True), "2": ("bn1", False),
               "3": ("conv2", True), "5": ("bn2", False),
               "6": ("conv3", True), "8": ("bn3", False)}[idx]
        name, is_conv = sub
        if is_conv:
            return (upc, name, "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        return (upc, name, "scale" if p == "weight" else "bias"), _identity
    m = re.fullmatch(r"Conv_1x1\.(weight|bias)", key)
    if m:
        p = m.group(1)
        return ("head", "kernel" if p == "weight" else "bias"), \
            _dense_from_1x1 if p == "weight" else _identity
    raise KeyError(f"unmapped U-RWKV key: {key}")


# ---------------------------------------------------------------------------
# HCMA-UNet (compared_model/HCMA/HCMA.py:1299, default flags: is_vssb=True,
# is_split=True, is_slice_attention=True, is_skip=False, predict_mode).
# Encoders: encoders.0 = DenseConv stem; encoders.n = Down (ResNeXt
# downsample + TriplaneMamba + DenseConv extractor). Decoders: Up (1x1
# adapt+IN + add-skip + ConvTranspose k=s). Heads: out ModuleList of
# `depth` entries of which only out[depth-1] is live in predict mode
# (HCMA.py:1425) — out.0..out.{depth-2} are dead weights and dropped.
# ---------------------------------------------------------------------------

_HCMA_DEC_STRIDES = (1, 2, 2, 2)  # decoder m uses strides[depth-1-m]


def _hcma_convT(stride: int):
    def tf(w: np.ndarray) -> np.ndarray:
        # ConvTranspose3d k=s: (I, O, s, s, s) -> Dense (I, O*s^3); the
        # (o, s1, s2, s3) channel factoring matches pixel_shuffle_3d.
        return w.reshape(w.shape[0], -1)
    return tf


def _hcma_convT_b(stride: int):
    def tf(b: np.ndarray) -> np.ndarray:
        return np.repeat(b, stride ** 3)
    return tf


def _pos_embed_tf(w: np.ndarray) -> np.ndarray:
    """(1, C, L, 1, 1) (any axis position) → (L, C)."""
    c = w.shape[1]
    return np.transpose(w.reshape(c, -1))


def _conv2d_dw_tf(w: np.ndarray) -> np.ndarray:
    """Depthwise Conv2d (C, 1, k, k) → (k, k, 1, C)."""
    return np.transpose(w, (2, 3, 1, 0))


def _hcma_dense_conv(prefix, rest):
    """DenseConv conv_list: 0=(dw 3x3 conv, IN affine), 1=(expand 1x1),
    2=(out 1x1)."""
    m = re.fullmatch(r"conv_list\.([012])\.([01])\.(weight|bias)", rest)
    if not m:
        return None
    i, j, p = m.group(1), m.group(2), m.group(3)
    if i == "0":
        if j == "0":
            return prefix + ("dw", "kernel" if p == "weight" else "bias"), \
                _conv3d_w if p == "weight" else _identity
        return prefix + ("norm", "scale" if p == "weight" else "bias"), \
            _identity
    sub = "expand" if i == "1" else "out"
    return prefix + (sub, "kernel" if p == "weight" else "bias"), \
        _conv1x1_w if p == "weight" else _identity


def _hcma_resnext(prefix, rest):
    """ResNeXtConv conv_list: 0=(1x1 pw1, IN n1), 1=(3x3 grouped dw, n2),
    2=(1x1 pw2, n3)."""
    m = re.fullmatch(r"conv_list\.([012])\.([01])\.(weight|bias)", rest)
    if not m:
        return None
    i, j, p = m.group(1), m.group(2), m.group(3)
    conv_name, norm_name, is_1x1 = {
        "0": ("pw1", "n1", True), "1": ("dw", "n2", False),
        "2": ("pw2", "n3", True)}[i]
    if j == "0":
        tf = (_conv1x1_w if is_1x1 else _conv3d_w) if p == "weight" \
            else _identity
        return prefix + (conv_name,
                         "kernel" if p == "weight" else "bias"), tf
    return prefix + (norm_name, "scale" if p == "weight" else "bias"), \
        _identity


def _hcma_ss2d(prefix, rest):
    m = re.fullmatch(
        r"(x_proj_weight|dt_projs_weight|dt_projs_bias|A_logs|Ds)", rest)
    if m:
        return prefix + (m.group(1),), _identity
    m = re.fullmatch(r"(in_proj|out_proj)\.weight", rest)
    if m:
        return prefix + (m.group(1), "kernel"), _dense_w
    m = re.fullmatch(r"conv2d\.(weight|bias)", rest)
    if m:
        p = m.group(1)
        return prefix + (f"conv2d_{'kernel' if p == 'weight' else 'bias'}",
                         ), _conv2d_dw_tf if p == "weight" else _identity
    m = re.fullmatch(r"out_norm\.(weight|bias)", rest)
    if m:
        return prefix + ("out_norm",
                         "scale" if m.group(1) == "weight" else "bias"), \
            _identity
    return None


def _hcma_dir_mamba(prefix, rest):
    """DirectionalMamba: .mamba = VSSBlock (down/ln_1/self_attention/up),
    .slice_attention = AxialAttention3D."""
    m = re.fullmatch(r"mamba\.(down|up)\.(weight|bias)", rest)
    if m:
        sub, p = m.group(1), m.group(2)
        return prefix + ("vssb", sub,
                         "kernel" if p == "weight" else "bias"), \
            _dense_w if p == "weight" else _identity
    m = re.fullmatch(r"mamba\.ln_1\.(weight|bias)", rest)
    if m:
        return prefix + ("vssb", "ln_1",
                         "scale" if m.group(1) == "weight" else "bias"), \
            _identity
    m = re.fullmatch(r"mamba\.self_attention\.(.+)", rest)
    if m:
        return _hcma_ss2d(prefix + ("vssb", "ss2d"), m.group(1))
    m = re.fullmatch(r"slice_attention\.(query|key|value)_conv\."
                     r"(weight|bias)", rest)
    if m:
        qkv = {"query": "q", "key": "k", "value": "v"}[m.group(1)]
        p = m.group(2)
        return prefix + ("slice_attn", qkv,
                         "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    if rest == "slice_attention.pos_embed":
        return prefix + ("slice_attn", "pos_embed"), _pos_embed_tf
    if rest == "slice_attention.gamma":
        return prefix + ("slice_attn", "gamma"), lambda w: w.reshape(())
    return None


def _map_hcma_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    # stem
    m = re.fullmatch(r"encoders\.0\.(.+)", key)
    if m:
        got = _hcma_dense_conv(("stem",), m.group(1))
        if got:
            return got
        raise KeyError(f"unmapped HCMA stem key: {key}")
    # encoder Down stages
    m = re.fullmatch(r"encoders\.(\d+)\.(.+)", key)
    if m:
        d, rest = f"down_{int(m.group(1)) - 1}", m.group(2)
        m2 = re.fullmatch(r"downsample_resnext\.(.+)", rest)
        if m2:
            got = _hcma_resnext((d, "down_resnext"), m2.group(1))
            if got:
                return got
        m2 = re.fullmatch(r"extractor\.(\d+)\.(.+)", rest)
        if m2:
            got = _hcma_dense_conv((d, f"extract_{m2.group(1)}"),
                                   m2.group(2))
            if got:
                return got
        m2 = re.fullmatch(r"tmamba\.fusion\.0\.(weight|bias)", rest)
        if m2:
            p = m2.group(1)
            return (d, "tmamba", "fusion",
                    "kernel" if p == "weight" else "bias"), \
                _conv1x1_w if p == "weight" else _identity
        m2 = re.fullmatch(r"tmamba\.(mamba_[xyz])\.(.+)", rest)
        if m2:
            got = _hcma_dir_mamba((d, "tmamba", m2.group(1)), m2.group(2))
            if got:
                return got
        raise KeyError(f"unmapped HCMA encoder key: {key}")
    # decoder Up stages
    m = re.fullmatch(r"decoders\.(\d)\.extractor\.0\.([01])\.(weight|bias)",
                     key)
    if m:
        u, j, p = f"up_{m.group(1)}", m.group(2), m.group(3)
        if j == "0":
            return (u, "adapt", "kernel" if p == "weight" else "bias"), \
                _conv1x1_w if p == "weight" else _identity
        return (u, "n", "scale" if p == "weight" else "bias"), _identity
    m = re.fullmatch(r"decoders\.(\d)\.up_transpose\.(weight|bias)", key)
    if m:
        u, p = f"up_{m.group(1)}", m.group(2)
        s = _HCMA_DEC_STRIDES[int(m.group(1))]
        return (u, "up", "kernel" if p == "weight" else "bias"), \
            _hcma_convT(s) if p == "weight" else _hcma_convT_b(s)
    # heads: only out[depth-1] is live in predict mode
    m = re.fullmatch(r"out\.(\d)\.conv1\.(weight|bias)", key)
    if m:
        if m.group(1) != "3":
            return None  # dead heads (predict mode uses out[-1] only)
        p = m.group(2)
        return ("out_3", "kernel" if p == "weight" else "bias"), \
            _conv1x1_w if p == "weight" else _identity
    raise KeyError(f"unmapped HCMA key: {key}")


_CONVERTERS = {"MedNeXt": _map_mednext_key,
               "SlimUNETR": _make_slim_mapper(),
               "SegFormer": _map_segformer_key,
               "HDense": _map_hdense_key,
               "NestedFormer": _map_nestedformer_key,
               "UNETRpp": _map_unetrpp_key,
               "A2FSeg": _map_a2fseg_key,
               "SuperLightNet": _map_superlightnet_key,
               "VSmTrans": _map_vsmtrans_key,
               "UKAN": _map_ukan_key,
               "URWKV": _map_urwkv_key,
               "HCMA": _map_hcma_key}


def convert_zoo_state_dict(model_name: str, state_dict: Dict[str, Any],
                           params_template=None) -> Dict[str, Any]:
    """Reference zoo state dict → nested flax params dict."""
    map_key = _CONVERTERS[model_name]
    nested: Dict[str, Any] = {}
    for key, value in state_dict.items():
        mapped = map_key(key)
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
