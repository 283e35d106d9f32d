"""Fenced ablation profile of the flagship train step (VERDICT r4 #1).

Times each piece of the 128^3 bs16 train step in ONE process with the
window-final-fence protocol (utils/benchmarking.py) and prints a table:
ms/iter, XLA cost-analysis GFLOPs and GB moved, implied TF/s and GB/s.

Usage: python tools/profile_step.py [--size 128] [--batch 16] [--quick]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from veloxseg_tpu.utils.benchmarking import median_rate  # noqa: E402

PEAK_TF = 197.0     # v5e bf16
PEAK_GBS = 819.0    # v5e HBM


def _analysis(jitted, *args):
    try:
        a = jitted.lower(*args).compile().cost_analysis()
        if a:
            return float(a.get("flops", 0.0)), float(
                a.get("bytes accessed", 0.0))
    except Exception:
        pass
    return None, None


ROWS = []


def bench(name, fn, *args, seconds=4.0, windows=2):
    jitted = jax.jit(fn)
    flops, byts = _analysis(jitted, *args)
    rate = median_rate(lambda: jitted(*args), 1.0,
                       windows=windows, seconds=seconds)
    ms = 1e3 / rate
    tf = (flops or 0.0) * rate / 1e12
    gbs = (byts or 0.0) * rate / 1e9
    ROWS.append((name, ms, (flops or 0) / 1e9, (byts or 0) / 1e9, tf, gbs))
    print(f"{name:42s} {ms:9.2f} ms  {(flops or 0)/1e9:9.1f} GF "
          f"{(byts or 0)/1e9:8.2f} GB  {tf:7.1f} TF/s ({100*tf/PEAK_TF:4.1f}%)"
          f"  {gbs:7.1f} GB/s ({100*gbs/PEAK_GBS:4.1f}%)", flush=True)
    return ms


def grad_of(apply_fn):
    """fwd+bwd closure: grads wrt params AND input."""
    def loss(params, x, rng):
        outs = apply_fn(params, x, rng)
        leaves = [o for o in jax.tree_util.tree_leaves(outs)
                  if hasattr(o, "astype")]  # Encoder also returns flags
        return sum(jnp.sum(o.astype(jnp.float32) * 1e-6) for o in leaves)
    return jax.grad(loss, argnums=(0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    S, B = args.size, args.batch
    seconds = 2.0 if args.quick else 4.0

    print(f"device: {jax.devices()[0]}  size={S}^3 batch={B}", flush=True)

    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    from veloxseg_tpu.nn.encoder import Encoder, TransformerEncoder
    from veloxseg_tpu.nn.decoder import RCDecoder, SegDecoder
    from veloxseg_tpu.nn.conv_blocks import JLC
    from veloxseg_tpu.ops import packed_conv

    cfg = VeloxSegConfig().replace(depths=(1, 1, 1, 1),
                                   input_size=(S, S, S))
    if S % 3 != 0:
        cfg = cfg.replace(min_big_window_sizes=(
            (4, 4, 4), (8, 8, 8), (4, 4, 4), (4, 4, 4)))

    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    x = jax.random.normal(key, (B, S, S, S, 2), jnp.float32).astype(bf)
    only = set(args.only.split(",")) if args.only else None

    def want(tag):
        return only is None or tag in only

    # ---------------- full model ----------------
    model = VeloxSeg(cfg, train_blocked_heads=True)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": key, "dropout": key}, x[:1], train=True)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(bf) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, variables["params"])

    def apply_train(p, xx, rng):
        return model.apply({"params": p}, xx, train=True,
                           rngs={"dropout": rng})

    def apply_eval(p, xx, rng):
        return model.apply({"params": p}, xx, train=False)

    if want("model"):
        bench("model fwd (train outputs)", apply_train, params, x, key,
              seconds=seconds)
        bench("model fwd+bwd", grad_of(apply_train), params, x, key,
              seconds=seconds)
        bench("model fwd (eval)", apply_eval, params, x, key,
              seconds=seconds)

    # ---------------- full train step ----------------
    if want("step"):
        from veloxseg_tpu.train.loss import CompositeLoss
        from veloxseg_tpu.train.optim import build_optimizer
        from veloxseg_tpu.train.train_state import (create_train_state,
                                                    train_step_fn)
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.standard_normal((B, S, S, S)) > 1.2, jnp.int32)
        tcfg = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
                "Feature_Loss_weight": 2.0}
        loss_obj = CompositeLoss("VeloxSeg", tcfg, num_modal=2,
                                 blocked_scale=cfg.patch_size,
                                 blocked_in_ch=cfg.in_ch)
        tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
        state = create_train_state(model, variables["params"], tx)
        step = train_step_fn(loss_obj, compute_dtype=bf)
        holder = [state]

        def dispatch():
            new_state, aux = step(holder[0], x, y, key)
            holder[0] = new_state
            return aux["loss"]
        rate = median_rate(dispatch, 1.0, windows=2, seconds=seconds)
        print(f"{'FULL train step':42s} {1e3/rate:9.2f} ms", flush=True)

    # ---------------- encoder pieces ----------------
    enc = Encoder(
        input_size=cfg.input_size, patch_size=cfg.patch_size,
        in_ch=cfg.in_ch, base_ch=cfg.base_ch, conv_depths=cfg.conv_depths,
        kernel_sizes=cfg.kernel_sizes, min_dim_group=cfg.min_dim_group,
        conv_expansion_factor=cfg.conv_expansion_factor,
        attn_base_ch=cfg.attn_base_ch, depths=cfg.depths,
        min_big_window_sizes=cfg.min_big_window_sizes,
        min_small_window_sizes=cfg.min_small_window_sizes,
        min_dim_head=cfg.min_dim_head, scale_factors=cfg.scale_factors,
        num_heads=cfg.num_heads, attn_drop=cfg.attn_drop,
        proj_drop=cfg.proj_drop, drop_path=cfg.drop_path,
        ffn_expansion_ratio=cfg.ffn_expansion_ratio,
        act_layer=cfg.act_layer, patch_norm=cfg.patch_norm,
        qkv_bias=cfg.qkv_bias, conv_drop=cfg.conv_drop)
    if want("encoder"):
        ev = jax.jit(enc.init, static_argnums=2)(
            {"params": key, "dropout": key}, x[:1], False)
        ep = jax.tree_util.tree_map(
            lambda a: a.astype(bf) if jnp.issubdtype(a.dtype, jnp.floating)
            else a, ev["params"])

        def enc_apply(p, xx, rng):
            return enc.apply({"params": p}, xx, False,
                             rngs={"dropout": rng})
        bench("encoder fwd", enc_apply, ep, x, key, seconds=seconds)
        bench("encoder fwd+bwd", grad_of(enc_apply), ep, x, key,
              seconds=seconds)

    # attention branch alone
    if want("attn"):
        tenc = TransformerEncoder(
            input_size=cfg.input_size, patch_size=cfg.patch_size,
            in_channels=tuple(cfg.in_ch), embed_dim=cfg.attn_base_ch,
            depths=cfg.depths,
            min_big_window_sizes=cfg.min_big_window_sizes,
            min_small_window_sizes=cfg.min_small_window_sizes,
            scale_factors=cfg.scale_factors, num_heads=cfg.num_heads,
            min_dim_head=cfg.min_dim_head,
            ffn_expansion_ratio=cfg.ffn_expansion_ratio,
            attn_drop=cfg.attn_drop, proj_drop=cfg.proj_drop,
            drop_path=cfg.drop_path, act_layer=cfg.act_layer,
            patch_norm=cfg.patch_norm, qkv_bias=cfg.qkv_bias)
        xs = [x[..., :1], x[..., 1:]]
        tv = jax.jit(tenc.init, static_argnums=2)(
            {"params": key, "dropout": key}, [a[:1] for a in xs], False)
        tp = jax.tree_util.tree_map(
            lambda a: a.astype(bf) if jnp.issubdtype(a.dtype, jnp.floating)
            else a, tv["params"])

        def tenc_apply(p, xx, rng):
            return tenc.apply({"params": p}, xx, False,
                              rngs={"dropout": rng})
        bench("attn branch fwd", tenc_apply, tp, xs, key, seconds=seconds)
        bench("attn branch fwd+bwd", grad_of(tenc_apply), tp, xs, key,
              seconds=seconds)

    # ---------------- decoders ----------------
    g = S // cfg.patch_size
    pyramid = [jax.random.normal(key, (B, g >> i, g >> i, g >> i,
                                       cfg.base_ch << i), jnp.float32
                                 ).astype(bf) for i in range(4)]
    if want("dec"):
        dec = SegDecoder(patch_size=cfg.patch_size, base_ch=cfg.base_ch,
                         out_ch=cfg.n_classes, depths=cfg.conv_depths,
                         kernel_sizes=cfg.kernel_sizes,
                         min_dim_group=cfg.min_dim_group,
                         expansion_factor=cfg.conv_expansion_factor,
                         dropout=cfg.conv_drop, deep_supervision=True,
                         blocked_head=True)
        dv = jax.jit(dec.init, static_argnums=2)(
            {"params": key, "dropout": key},
            [a[:1] for a in pyramid], False)
        dp = jax.tree_util.tree_map(
            lambda a: a.astype(bf) if jnp.issubdtype(a.dtype, jnp.floating)
            else a, dv["params"])

        def dec_apply(p, xx, rng):
            return dec.apply({"params": p}, xx, False,
                             rngs={"dropout": rng})
        bench("seg decoder fwd", dec_apply, dp, pyramid, key,
              seconds=seconds)
        bench("seg decoder fwd+bwd", grad_of(dec_apply), dp, pyramid, key,
              seconds=seconds)

    if want("rc"):
        # teacher decoder input: concat(attn_m, enc) = 2x channels
        rc_pyr = [jnp.concatenate([a, a], axis=-1) for a in pyramid]
        rc = RCDecoder(in_channel=1, dec_channel=cfg.base_ch,
                       patch_size=cfg.patch_size, depths=cfg.conv_depths,
                       kernel_sizes=cfg.kernel_sizes,
                       min_dim_group=cfg.min_dim_group,
                       expansion_factor=cfg.conv_expansion_factor,
                       dropout=cfg.conv_drop, blocked_head=True)
        rv = jax.jit(rc.init, static_argnums=2)(
            {"params": key, "dropout": key},
            [a[:1] for a in rc_pyr], False)
        rp = jax.tree_util.tree_map(
            lambda a: a.astype(bf) if jnp.issubdtype(a.dtype, jnp.floating)
            else a, rv["params"])

        def rc_apply(p, xx, rng):
            return rc.apply({"params": p}, xx, False,
                            rngs={"dropout": rng})
        bench("rc decoder fwd (x1 of 2)", rc_apply, rp, rc_pyr, key,
              seconds=seconds)
        bench("rc decoder fwd+bwd (x1 of 2)", grad_of(rc_apply), rp,
              rc_pyr, key, seconds=seconds)

    # ---------------- micro: packed JLC per level ----------------
    if want("jlc"):
        groups = [cfg.base_ch * 2 ** i // cfg.min_dim_group[i]
                  for i in range(4)]
        for lvl in range(4):
            gg = g >> lvl
            c = cfg.base_ch << lvl
            if gg % 2:
                continue
            xp = jax.random.normal(
                key, (B, gg // 2, gg // 2, gg // 2, 8 * c), jnp.float32
            ).astype(bf)
            blk = JLC(kernel_sizes=cfg.kernel_sizes, groups=groups[lvl],
                      expansion_factor=cfg.conv_expansion_factor[lvl],
                      dropout=0.0, packed_io=True)
            bv = jax.jit(blk.init, static_argnums=2)(
                {"params": key, "dropout": key}, xp[:1], True)
            bp = jax.tree_util.tree_map(
                lambda a: a.astype(bf)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                bv["params"])

            def blk_apply(p, xx, rng):
                return blk.apply({"params": p}, xx, True,
                                 rngs={"dropout": rng})
            bench(f"packed JLC L{lvl} ({gg}^3 grid C{c} G{groups[lvl]}) "
                  f"f+b", grad_of(blk_apply), bp, xp, key,
                  seconds=seconds)

    # ---------------- micro: packed conv / IN / dense at L0 ----------
    if want("micro"):
        c, gg, G = cfg.base_ch, g, cfg.base_ch // cfg.min_dim_group[0]
        xp = jax.random.normal(key, (B, gg // 2, gg // 2, gg // 2, 8 * c),
                               jnp.float32).astype(bf)
        wk = {k: jax.random.normal(key, (k, k, k, c // G, c),
                                   jnp.float32).astype(bf)
              for k in (1, 3, 5)}

        def conv_only(xx, ws):
            wp = packed_conv.packed_kernel(
                [(k, ws[k]) for k in (1, 3, 5)], c, G)
            return packed_conv.conv_packed(xx, wp)
        bench("L0 packed conv fwd (dense kernel)", conv_only, xp, wk,
              seconds=seconds)
        bench("L0 packed conv f+b",
              jax.grad(lambda xx, ws: jnp.sum(
                  conv_only(xx, ws).astype(jnp.float32) * 1e-6),
                  argnums=(0, 1)), xp, wk, seconds=seconds)

        def in_only(xx):
            return packed_conv.instance_norm_packed(xx, c, 1, 1)
        bench("L0 instance_norm_packed fwd", in_only, xp, seconds=seconds)

        kmlp = jax.random.normal(key, (c, 3 * c), jnp.float32).astype(bf)

        def bdd(xx, kk):
            return packed_conv.block_diag_dense(xx, kk, None)
        bench("L0 block_diag_dense fwd (exp 3x)", bdd, xp, kmlp,
              seconds=seconds)

    print("\nname, ms, GF, GB, TF/s, GB/s")
    for r in ROWS:
        print(f"{r[0]}, {r[1]:.2f}, {r[2]:.1f}, {r[3]:.2f}, {r[4]:.1f}, "
              f"{r[5]:.1f}")


if __name__ == "__main__":
    main()
