"""Minimal MONAI/timm/batchgenerators stand-ins so the reference torch
models import without those packages (parity tests only).

Covered surface (everything the reference ``model/`` package and the
importable ``compared_model/`` zoo members touch): ``PatchEmbed``,
``DropPath``, ``trunc_normal_``, ``get_act_layer``, ``get_norm_layer``,
``Convolution`` (conv_only subset incl. transposed + groups),
``UpSample`` (NONTRAINABLE), ``Act``/``Norm``/``InterpolateMode``/
``UpsampleMode`` constants, ``optional_import``; plus timm
``trunc_normal_``/``DropPath`` and batchgenerators ``pad_nd_image``
(import-time only) via :func:`install_timm_and_batchgenerators`.

These are our own implementations of the documented behavior (no MONAI
code), used only for parity tests against reference weights.
``install()`` registers them under the ``monai`` module names.
"""

from __future__ import annotations

import sys
import types


def _build_modules():
    import torch
    import torch.nn as nn

    class PatchEmbed(nn.Module):
        def __init__(self, patch_size=2, in_chans=1, embed_dim=48,
                     norm_layer=None, spatial_dims=3):
            super().__init__()
            if isinstance(patch_size, int):
                patch_size = (patch_size,) * spatial_dims
            conv = nn.Conv3d if spatial_dims == 3 else nn.Conv2d
            self.patch_size = patch_size
            self.proj = conv(in_chans, embed_dim, kernel_size=patch_size,
                             stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer is not None \
                else None

        def forward(self, x):
            for s, p in zip(x.shape[2:], self.patch_size):
                if s % p:
                    raise ValueError(
                        f"stub PatchEmbed requires divisible input, got "
                        f"{tuple(x.shape[2:])} vs patch {self.patch_size}")
            x = self.proj(x)
            if self.norm is not None:
                shape = x.shape
                x = self.norm(x.flatten(2).transpose(1, 2))
                x = x.transpose(1, 2).view(shape)
            return x

    class DropPath(nn.Module):
        def __init__(self, drop_prob: float = 0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = float(drop_prob)
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if self.scale_by_keep:
                mask = mask / keep
            return x * mask

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)

    def get_act_layer(name):
        if isinstance(name, tuple):
            name, kwargs = name
        else:
            kwargs = {}
        table = {"gelu": nn.GELU, "relu": nn.ReLU,
                 "leakyrelu": nn.LeakyReLU, "prelu": nn.PReLU}
        return table[str(name).lower()](**kwargs)

    def get_norm_layer(name, spatial_dims=3, channels=1):
        """MONAI get_norm_layer semantics for the names UNETR++ uses:
        "instance" → torch InstanceNorm (affine=False default),
        ("group", {"num_groups": g}), "batch"."""
        if isinstance(name, tuple):
            name, kwargs = name
        else:
            kwargs = {}
        name = str(name).lower()
        if name == "instance":
            return nn.InstanceNorm3d(channels, **kwargs)
        if name == "batch":
            return nn.BatchNorm3d(channels, **kwargs)
        if name == "group":
            return nn.GroupNorm(num_channels=channels, **kwargs)
        raise KeyError(name)

    class Convolution(nn.Sequential):
        """conv_only subset of monai Convolution (dynunet usage): a
        Sequential holding one (transposed) conv under the name "conv".
        ``padding`` defaults to monai's same_padding (k-1)//2
        (stride-independent); transposed convs must pass it explicitly
        (monai's transposed default also involves output_padding logic the
        stub does not reproduce — every in-tree caller routes through
        get_conv_layer, which supplies both)."""

        def __init__(self, spatial_dims=3, in_channels=1, out_channels=1,
                     strides=1, kernel_size=3, act=None, norm=None,
                     dropout=None, bias=True, conv_only=True,
                     is_transposed=False, padding=None,
                     output_padding=None, groups=1):
            super().__init__()
            assert conv_only, "stub Convolution supports conv_only=True"
            if padding is None:
                assert not is_transposed, \
                    "stub Convolution: transposed conv needs explicit padding"
                k = kernel_size if isinstance(kernel_size, int) \
                    else kernel_size[0]
                padding = (k - 1) // 2
            if is_transposed:
                conv = nn.ConvTranspose3d(
                    in_channels, out_channels, kernel_size,
                    stride=strides, padding=padding,
                    output_padding=output_padding or 0, bias=bias,
                    groups=groups)
            else:
                conv = nn.Conv3d(in_channels, out_channels, kernel_size,
                                 stride=strides, padding=padding, bias=bias,
                                 groups=groups)
            self.add_module("conv", conv)

    class UpSample(nn.Module):
        """monai UpSample, NONTRAINABLE mode: parameter-free interpolate
        (linear → trilinear for 3-D)."""

        def __init__(self, spatial_dims=3, in_channels=None,
                     out_channels=None, scale_factor=2, mode="nontrainable",
                     interp_mode="linear", align_corners=False, **kw):
            super().__init__()
            assert str(mode).lower() == "nontrainable", \
                "stub UpSample supports NONTRAINABLE only"
            self.scale_factor = scale_factor
            self.align_corners = align_corners
            self.interp = {2: "bilinear", 3: "trilinear"}[spatial_dims] \
                if str(interp_mode).lower() == "linear" \
                else str(interp_mode).lower()

        def forward(self, x):
            return nn.functional.interpolate(
                x, scale_factor=self.scale_factor, mode=self.interp,
                align_corners=self.align_corners)

    def optional_import(name, *a, **k):
        import importlib
        try:
            return importlib.import_module(name), True
        except ImportError:
            return None, False

    def _get_conv_layer(spatial_dims=3, in_channels=1, out_channels=1,
                        kernel_size=3, stride=1, act="prelu",
                        norm="instance", dropout=None, bias=False,
                        conv_only=True, is_transposed=False):
        """monai dynunet get_conv_layer: same-padding from (k, s); adds
        output_padding for transposed convs."""
        import numpy as _np
        k = _np.atleast_1d(kernel_size)
        s = _np.atleast_1d(stride)
        pad = tuple(int(p) for p in (k - s + 1) / 2)
        if len(pad) == 1:
            pad = pad * spatial_dims
        out_pad = None
        if is_transposed:
            out_pad = tuple(2 * p + st - kk for p, st, kk in
                            zip(pad, _np.broadcast_to(s, (spatial_dims,)),
                                _np.broadcast_to(k, (spatial_dims,))))
        return Convolution(spatial_dims, in_channels, out_channels,
                           strides=stride, kernel_size=kernel_size,
                           bias=bias, conv_only=conv_only,
                           is_transposed=is_transposed, padding=pad,
                           output_padding=out_pad)

    class UnetBasicBlock(nn.Module):
        """monai dynunet UnetBasicBlock: 2× (conv → norm → lrelu)."""

        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size=3, stride=1, norm_name="instance",
                     act_name=("leakyrelu", {"inplace": True,
                                             "negative_slope": 0.01}),
                     dropout=None):
            super().__init__()
            self.conv1 = _get_conv_layer(spatial_dims, in_channels,
                                         out_channels, kernel_size, stride)
            self.conv2 = _get_conv_layer(spatial_dims, out_channels,
                                         out_channels, kernel_size, 1)
            self.lrelu = get_act_layer(act_name)
            self.norm1 = get_norm_layer(norm_name, spatial_dims,
                                        out_channels)
            self.norm2 = get_norm_layer(norm_name, spatial_dims,
                                        out_channels)

        def forward(self, inp):
            out = self.lrelu(self.norm1(self.conv1(inp)))
            return self.lrelu(self.norm2(self.conv2(out)))

    class UnetResBlock(nn.Module):
        """monai dynunet UnetResBlock: basic block + 1×1 residual."""

        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size=3, stride=1, norm_name="instance",
                     act_name=("leakyrelu", {"inplace": True,
                                             "negative_slope": 0.01}),
                     dropout=None):
            super().__init__()
            import numpy as _np
            self.conv1 = _get_conv_layer(spatial_dims, in_channels,
                                         out_channels, kernel_size, stride)
            self.conv2 = _get_conv_layer(spatial_dims, out_channels,
                                         out_channels, kernel_size, 1)
            self.lrelu = get_act_layer(act_name)
            self.norm1 = get_norm_layer(norm_name, spatial_dims,
                                        out_channels)
            self.norm2 = get_norm_layer(norm_name, spatial_dims,
                                        out_channels)
            self.downsample = in_channels != out_channels or \
                _np.atleast_1d(stride).max() != 1
            if self.downsample:
                self.conv3 = _get_conv_layer(spatial_dims, in_channels,
                                             out_channels, 1, stride)
                self.norm3 = get_norm_layer(norm_name, spatial_dims,
                                            out_channels)

        def forward(self, inp):
            residual = inp
            out = self.lrelu(self.norm1(self.conv1(inp)))
            out = self.norm2(self.conv2(out))
            if self.downsample:
                residual = self.norm3(self.conv3(residual))
            return self.lrelu(out + residual)

    class UnetrBasicBlock(nn.Module):
        """monai UnetrBasicBlock: wraps one (res) block as ``layer``."""

        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size=3, stride=1, norm_name="instance",
                     res_block=True):
            super().__init__()
            cls = UnetResBlock if res_block else UnetBasicBlock
            self.layer = cls(spatial_dims, in_channels, out_channels,
                             kernel_size=kernel_size, stride=stride,
                             norm_name=norm_name)

        def forward(self, inp):
            return self.layer(inp)

    class UnetOutBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     dropout=None):
            super().__init__()
            self.conv = _get_conv_layer(spatial_dims, in_channels,
                                        out_channels, kernel_size=1,
                                        stride=1, bias=True,
                                        conv_only=True)

        def forward(self, inp):
            return self.conv(inp)

    return (PatchEmbed, DropPath, trunc_normal_, get_act_layer,
            get_norm_layer, Convolution, UpSample, optional_import,
            _get_conv_layer, UnetBasicBlock, UnetResBlock,
            UnetrBasicBlock, UnetOutBlock)


def _build_losses():
    import torch
    from torch import nn

    class DiceLoss(nn.Module):
        """MONAI ``DiceLoss`` semantics for the option set the reference
        uses (``utils/loss.py:18-20``): softmax over channel 1, one-hot of
        a (B, 1, ...) integer target, optional background exclusion,
        smooth 1e-5 in numerator and denominator, per-(batch, class) dice
        reduced by mean. Mirrors MONAI's documented formula; the JAX twin
        is ``veloxseg_tpu.train.loss.dice_loss``."""

        def __init__(self, include_background=True, to_onehot_y=False,
                     softmax=False, smooth_nr=1e-5, smooth_dr=1e-5):
            super().__init__()
            self.include_background = include_background
            self.to_onehot_y = to_onehot_y
            self.softmax = softmax
            self.smooth_nr = smooth_nr
            self.smooth_dr = smooth_dr

        def forward(self, input, target):
            if self.softmax:
                input = torch.softmax(input, dim=1)
            n_ch = input.shape[1]
            if self.to_onehot_y:
                t = target.long()
                target = torch.zeros(
                    t.shape[0], n_ch, *t.shape[2:],
                    dtype=input.dtype).scatter_(1, t, 1.0)
            if not self.include_background:
                input = input[:, 1:]
                target = target[:, 1:]
            reduce_axis = list(range(2, input.ndim))
            intersection = (target * input).sum(dim=reduce_axis)
            denominator = target.sum(dim=reduce_axis) + input.sum(
                dim=reduce_axis)
            f = 1.0 - (2.0 * intersection + self.smooth_nr) / (
                denominator + self.smooth_dr)
            return f.mean()

    return DiceLoss


def install() -> None:
    """Register the stub under ``monai.*`` (no-op if real MONAI exists)."""
    try:
        import monai  # noqa: F401
        return
    except ImportError:
        pass
    if "monai" in sys.modules:
        return

    (PatchEmbed, DropPath, trunc_normal_, get_act_layer, get_norm_layer,
     Convolution, UpSample, optional_import, get_conv_layer,
     UnetBasicBlock, UnetResBlock, UnetrBasicBlock,
     UnetOutBlock) = _build_modules()

    monai = types.ModuleType("monai")
    networks = types.ModuleType("monai.networks")
    blocks = types.ModuleType("monai.networks.blocks")
    layers = types.ModuleType("monai.networks.layers")
    convolutions = types.ModuleType("monai.networks.blocks.convolutions")
    upsample_mod = types.ModuleType("monai.networks.blocks.upsample")
    factories = types.ModuleType("monai.networks.layers.factories")
    layer_utils = types.ModuleType("monai.networks.layers.utils")
    utils = types.ModuleType("monai.utils")
    blocks.PatchEmbed = PatchEmbed
    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    layers.get_act_layer = get_act_layer
    layers.get_norm_layer = get_norm_layer
    convolutions.Convolution = Convolution
    upsample_mod.UpSample = UpSample
    blocks.convolutions = convolutions
    blocks.upsample = upsample_mod
    blocks.UpSample = UpSample
    dynunet = types.ModuleType("monai.networks.blocks.dynunet_block")
    dynunet.get_conv_layer = get_conv_layer
    dynunet.UnetBasicBlock = UnetBasicBlock
    dynunet.UnetResBlock = UnetResBlock
    dynunet.UnetOutBlock = UnetOutBlock
    blocks.dynunet_block = dynunet
    blocks.UnetOutBlock = UnetOutBlock
    blocks.UnetrBasicBlock = UnetrBasicBlock
    blocks.UnetBasicBlock = UnetBasicBlock
    blocks.UnetResBlock = UnetResBlock
    factories.Act = types.SimpleNamespace(PRELU="prelu")
    factories.Norm = types.SimpleNamespace(INSTANCE="instance",
                                           BATCH="batch")
    layer_utils.get_act_layer = get_act_layer
    layer_utils.get_norm_layer = get_norm_layer
    utils.optional_import = optional_import
    utils.InterpolateMode = types.SimpleNamespace(LINEAR="linear",
                                                  NEAREST="nearest")
    utils.UpsampleMode = types.SimpleNamespace(
        NONTRAINABLE="nontrainable", DECONV="deconv", PIXELSHUFFLE="ps")
    losses = types.ModuleType("monai.losses")
    losses.DiceLoss = _build_losses()
    monai.losses = losses
    sys.modules["monai.losses"] = losses

    monai.networks = networks
    monai.utils = utils
    networks.blocks = blocks
    networks.layers = layers
    sys.modules["monai"] = monai
    sys.modules["monai.networks"] = networks
    sys.modules["monai.networks.blocks"] = blocks
    sys.modules["monai.networks.blocks.convolutions"] = convolutions
    sys.modules["monai.networks.blocks.upsample"] = upsample_mod
    sys.modules["monai.networks.blocks.dynunet_block"] = dynunet
    sys.modules["monai.networks.layers"] = layers
    sys.modules["monai.networks.layers.factories"] = factories
    sys.modules["monai.networks.layers.utils"] = layer_utils
    sys.modules["monai.utils"] = utils


def install_timm_and_batchgenerators() -> None:
    """Stubs for the UNETR++ import chain: timm ``trunc_normal_`` and the
    (unused at forward time) batchgenerators ``pad_nd_image``."""
    import torch

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        tlayers = types.ModuleType("timm.models.layers")
        tlayers.trunc_normal_ = \
            lambda t, mean=0.0, std=1.0, a=-2.0, b=2.0: \
            torch.nn.init.trunc_normal_(t, mean, std, a, b)

        class _DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0, scale_by_keep=True):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        tlayers.DropPath = _DropPath

        def _to_ntuple(n):
            def tup(x):
                return tuple(x) if isinstance(x, (tuple, list)) else (x,) * n
            return tup

        tlayers.to_2tuple = _to_ntuple(2)
        tlayers.to_3tuple = _to_ntuple(3)
        timm.models = models
        models.layers = tlayers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = tlayers

    if "batchgenerators" not in sys.modules:
        bg = types.ModuleType("batchgenerators")
        aug = types.ModuleType("batchgenerators.augmentations")
        butils = types.ModuleType("batchgenerators.augmentations.utils")

        def pad_nd_image(*a, **k):
            raise RuntimeError("batchgenerators stub: not for runtime use")

        butils.pad_nd_image = pad_nd_image
        bg.augmentations = aug
        aug.utils = butils
        sys.modules["batchgenerators"] = bg
        sys.modules["batchgenerators.augmentations"] = aug
        sys.modules["batchgenerators.augmentations.utils"] = butils


def install_torchvision() -> None:
    """Minimal ``torchvision`` placeholder: the reference U-KAN imports it
    (plus ``transforms`` / ``save_image``) at module scope but never uses
    any of it in the network forward (``compared_model/UKAN/archs.py:3-7``).
    """
    if "torchvision" in sys.modules:
        return
    try:
        import torchvision  # noqa: F401
        return
    except ImportError:
        pass
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    utils = types.ModuleType("torchvision.utils")
    models = types.ModuleType("torchvision.models")

    def save_image(*a, **k):  # pragma: no cover - never called
        raise NotImplementedError("torchvision stub")

    utils.save_image = save_image
    tv.transforms = transforms
    tv.utils = utils
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.utils"] = utils
    sys.modules["torchvision.models"] = models


def install_wkv_cpu() -> None:
    """Intercept the reference U-RWKV's JIT CUDA-extension load.

    ``compared_model/URWKV/URWKV.py:28-29`` compiles ``wkv_cuda`` at import
    time from a hardcoded absolute path (broken off the authors' machine,
    CUDA-only anyway). This patches ``torch.utils.cpp_extension.load`` to
    return a pure-torch object implementing the SAME recurrence as the
    kernel (``cuda/wkv_cuda.cu:8-38``): per-(batch, channel) scan over T
    with running sums kept in log space —

        y_t = (Σ_{i<t} e^{(t-1-i)w + k_i} v_i + e^{u+k_t} v_t)
              / (Σ_{i<t} e^{(t-1-i)w + k_i} + e^{u+k_t})

    Forward only — enough for imported-weight forward-parity tests; the
    TPU training path uses :mod:`veloxseg_tpu.ops.wkv`.
    """
    import torch
    from torch.utils import cpp_extension

    if getattr(cpp_extension.load, "_wkv_stub", False):
        return
    orig_load = cpp_extension.load

    class _WkvCpu:
        @staticmethod
        def forward(B, T, C, w, u, k, v, y):
            p = torch.zeros(B, C, dtype=torch.float32)
            q = torch.zeros(B, C, dtype=torch.float32)
            o = torch.full((B, C), -1e38, dtype=torch.float32)
            for t in range(T):
                kt = k[:, t]
                vt = v[:, t]
                no = torch.maximum(o, u + kt)
                a = torch.exp(o - no)
                b = torch.exp(u + kt - no)
                y[:, t] = (a * p + b * vt) / (a * q + b)
                no = torch.maximum(w + o, kt)
                a = torch.exp(w + o - no)
                b = torch.exp(kt - no)
                p = a * p + b * vt
                q = a * q + b
                o = no

        @staticmethod
        def backward(*a, **k):  # pragma: no cover
            raise NotImplementedError(
                "wkv CPU stub is forward-only (parity tests)")

    def load(name, *a, **kw):
        if name == "wkv":
            return _WkvCpu()
        return orig_load(name, *a, **kw)

    load._wkv_stub = True
    cpp_extension.load = load


def install_mamba_ssm() -> None:
    """Pure-torch ``mamba_ssm`` stand-in for the reference HCMA-UNet.

    The reference imports ``Mamba`` and ``selective_scan_fn`` from the
    CUDA-only ``mamba_ssm`` package (``compared_model/HCMA/HCMA.py:14,
    28-30``). This registers a stub implementing the documented selective
    -scan semantics (state-space recurrence with optional grouped B/C,
    delta bias/softplus, D skip, z gating) as a plain python loop — slow,
    CPU-only, parity tests only. The live HCMA path (is_vssb=True) only
    calls ``selective_scan_fn``; ``Mamba`` itself is import-surface.
    """
    if "mamba_ssm" in sys.modules:
        return
    try:
        import mamba_ssm  # noqa: F401
        return
    except ImportError:
        pass
    import torch
    import torch.nn.functional as F
    from torch import nn

    def selective_scan_ref(u, delta, A, B, C, D=None, z=None,
                           delta_bias=None, delta_softplus=False,
                           return_last_state=False):
        """y_t = C_t·h_t + D·u_t with h_t = exp(Δ_t A)h_{t-1} + Δ_t B_t u_t.

        u/delta: (b, d, l); A: (d, n); B/C: (b, n, l) or grouped
        (b, k, n, l) with d split into k consecutive channel groups;
        D: (d,); z: (b, d, l) SiLU gate.
        """
        dtype_in = u.dtype
        u = u.float()
        delta = delta.float()
        b, d, l = u.shape
        n = A.shape[1]
        if delta_bias is not None:
            delta = delta + delta_bias.float()[None, :, None]
        if delta_softplus:
            delta = F.softplus(delta)
        if B.dim() == 4:
            k = B.shape[1]
            B = B.float().repeat_interleave(d // k, dim=1)   # (b, d, n, l)
            C = C.float().repeat_interleave(d // k, dim=1)
        else:
            B = B.float()[:, None].expand(b, d, n, l)
            C = C.float()[:, None].expand(b, d, n, l)
        deltaA = torch.exp(delta.unsqueeze(-1) * A.float()[None, :, None])
        # (b, d, l, n)
        deltaBu = (delta * u).unsqueeze(-1) * B.permute(0, 1, 3, 2)
        h = u.new_zeros(b, d, n)
        ys = []
        Ct = C.permute(0, 1, 3, 2)                            # (b, d, l, n)
        for t in range(l):
            h = deltaA[:, :, t] * h + deltaBu[:, :, t]
            ys.append((h * Ct[:, :, t]).sum(-1))
        y = torch.stack(ys, dim=-1)                           # (b, d, l)
        if D is not None:
            y = y + D.float()[None, :, None] * u
        if z is not None:
            y = y * F.silu(z.float())
        y = y.to(dtype_in)
        return (y, h) if return_last_state else y

    class Mamba(nn.Module):
        """Parameter-compatible Mamba block (pure torch forward)."""

        def __init__(self, d_model, d_state=16, d_conv=4, expand=2,
                     dt_rank="auto", conv_bias=True, bias=False, **kw):
            super().__init__()
            import math
            self.d_model = d_model
            self.d_state = d_state
            self.d_conv = d_conv
            self.d_inner = int(expand * d_model)
            self.dt_rank = math.ceil(d_model / 16) if dt_rank == "auto" \
                else dt_rank
            self.in_proj = nn.Linear(d_model, self.d_inner * 2, bias=bias)
            self.conv1d = nn.Conv1d(self.d_inner, self.d_inner,
                                    kernel_size=d_conv, groups=self.d_inner,
                                    padding=d_conv - 1, bias=conv_bias)
            self.x_proj = nn.Linear(self.d_inner,
                                    self.dt_rank + 2 * d_state, bias=False)
            self.dt_proj = nn.Linear(self.dt_rank, self.d_inner, bias=True)
            self.A_log = nn.Parameter(torch.log(torch.arange(
                1, d_state + 1, dtype=torch.float32).repeat(
                    self.d_inner, 1)))
            self.D = nn.Parameter(torch.ones(self.d_inner))
            self.out_proj = nn.Linear(self.d_inner, d_model, bias=bias)

        def forward(self, x):
            b, l, _ = x.shape
            xz = self.in_proj(x).transpose(1, 2)          # (b, 2*di, l)
            xi, z = xz.chunk(2, dim=1)
            xi = self.conv1d(xi)[..., :l]
            xi = torch.nn.functional.silu(xi)
            dbc = self.x_proj(xi.transpose(1, 2))         # (b, l, r+2n)
            dt, Bm, Cm = torch.split(
                dbc, [self.dt_rank, self.d_state, self.d_state], dim=-1)
            dt = self.dt_proj(dt).transpose(1, 2)         # (b, di, l)
            y = selective_scan_ref(
                xi, dt, -torch.exp(self.A_log.float()),
                Bm.transpose(1, 2), Cm.transpose(1, 2), self.D, z=z,
                delta_bias=None, delta_softplus=True)
            return self.out_proj(y.transpose(1, 2))

    mamba_ssm = types.ModuleType("mamba_ssm")
    ops = types.ModuleType("mamba_ssm.ops")
    iface = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
    iface.selective_scan_fn = selective_scan_ref
    iface.selective_scan_ref = selective_scan_ref
    mamba_ssm.Mamba = Mamba
    mamba_ssm.ops = ops
    ops.selective_scan_interface = iface
    sys.modules["mamba_ssm"] = mamba_ssm
    sys.modules["mamba_ssm.ops"] = ops
    sys.modules["mamba_ssm.ops.selective_scan_interface"] = iface
