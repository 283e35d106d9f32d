"""UNETR baseline (reference registers MONAI ``UNETR``,
``utils/load_model.py:18-20``).

Standard UNETR: ViT-B/16 backbone (hidden 768, 12 layers, 12 heads, MLP
3072, learned position embeddings, conv patch embed), skip features taken
from transformer layers 3/6/9/12, deconv+conv decoder pyramid with
residual conv blocks (instance norm), 1×1 head. MONAI defaults:
feature_size 16, conv_block=True, res_block=True.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.basic import he_normal
from ...nn.norms import LayerNorm
from ..registry import register_model
from .common import Conv3d, ConvTranspose3d, GroupNorm


class ResConvBlock(nn.Module):
    """UnetrBasicBlock: two conv3³+IN+LeakyReLU with a projected residual."""

    features: int

    @nn.compact
    def __call__(self, x):
        res = x
        y = Conv3d(self.features, 3, name="conv1")(x)
        y = GroupNorm(num_groups=self.features, name="norm1")(y)
        y = nn.leaky_relu(y, 0.01)
        y = Conv3d(self.features, 3, name="conv2")(y)
        y = GroupNorm(num_groups=self.features, name="norm2")(y)
        if res.shape[-1] != self.features:
            res = Conv3d(self.features, 1, padding=0, name="res_conv")(res)
            res = GroupNorm(num_groups=self.features, name="res_norm")(res)
        return nn.leaky_relu(y + res, 0.01)


class DeconvBlock(nn.Module):
    """UnetrPrUpBlock step / UnetrUpBlock: deconv 2×2 then conv block."""

    features: int
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose3d(self.features, 2, 2, name="deconv")(x)
        if self.with_conv:
            y = ResConvBlock(self.features, name="conv")(y)
        return y


class PrUpPath(nn.Module):
    """UnetrPrUpBlock: one initial bare deconv, then ``num_layer`` ×
    (deconv + res conv block). MONAI's encoder4 (num_layer=0) is therefore
    deconv-only, and no conv block follows the initial deconv."""

    features: int
    num_layer: int

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose3d(self.features, 2, 2, name="deconv_init")(x)
        for i in range(self.num_layer):
            y = DeconvBlock(self.features, name=f"up_{i}")(y)
        return y


class UNETR(nn.Module):
    out_channels: int = 2
    img_size: Tuple[int, int, int] = (96, 96, 96)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    patch_size: int = 16
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        p = self.patch_size
        b, d, h, w, _ = x.shape
        grid = (d // p, h // p, w // p)
        n_tokens = math.prod(grid)

        # Conv patch embedding + learned position embedding.
        tokens = Conv3d(self.hidden_size, p, stride=p, padding=0,
                        name="patch_embed")(x)
        tokens = tokens.reshape(b, n_tokens, self.hidden_size)
        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, n_tokens, self.hidden_size))
        tokens = tokens + pos
        tokens = nn.Dropout(self.dropout_rate)(tokens, deterministic=det)

        hidden_states = []
        for layer in range(self.num_layers):
            hcur = LayerNorm(name=f"l{layer}_norm1")(tokens)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.hidden_size,
                kernel_init=he_normal, name=f"l{layer}_attn")(
                    hcur, hcur, deterministic=det)
            tokens = tokens + attn
            hcur = LayerNorm(name=f"l{layer}_norm2")(tokens)
            mlp = nn.Dense(self.mlp_dim, kernel_init=he_normal,
                           name=f"l{layer}_fc1")(hcur)
            mlp = nn.gelu(mlp, approximate=False)
            mlp = nn.Dense(self.hidden_size, kernel_init=he_normal,
                           name=f"l{layer}_fc2")(mlp)
            tokens = tokens + mlp
            hidden_states.append(tokens)

        def to_vol(t):
            return t.reshape(b, *grid, self.hidden_size)

        z3, z6, z9, z12 = (hidden_states[2], hidden_states[5],
                           hidden_states[8], hidden_states[11])
        z12 = to_vol(LayerNorm(name="final_norm")(tokens))

        f = self.feature_size
        enc1 = ResConvBlock(f, name="encoder1")(x)
        # UnetrPrUpBlock up paths: init deconv + num_layer×(deconv+conv);
        # z3 → ×8 (num_layer=2), z6 → ×4 (num_layer=1), z9 → ×2 (bare).
        enc2 = PrUpPath(f * 2, num_layer=2, name="encoder2")(to_vol(z3))
        enc3 = PrUpPath(f * 4, num_layer=1, name="encoder3")(to_vol(z6))
        enc4 = PrUpPath(f * 8, num_layer=0, name="encoder4")(to_vol(z9))

        def up_cat(xin, skip, ch, name):
            up = ConvTranspose3d(ch, 2, 2, name=f"{name}_deconv")(xin)
            return ResConvBlock(ch, name=f"{name}_conv")(
                jnp.concatenate([up, skip], axis=-1))

        dec3 = up_cat(z12, enc4, f * 8, "decoder5")
        dec2 = up_cat(dec3, enc3, f * 4, "decoder4")
        dec1 = up_cat(dec2, enc2, f * 2, "decoder3")
        dec0 = up_cat(dec1, enc1, f, "decoder2")
        return nn.Dense(self.out_channels, kernel_init=he_normal,
                        name="out")(dec0)


@register_model("UNETR")
def build_unetr(cfg: dict) -> UNETR:
    return UNETR(out_channels=cfg.get("out_channels", 2),
                 img_size=tuple(cfg.get("img_size", (96, 96, 96))))
