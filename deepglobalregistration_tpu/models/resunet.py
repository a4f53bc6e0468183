"""ResUNet families — residual sparse U-Nets (model/resunet.py:16-1221).

Four structural families over one generic engine:

- "v1_3" — ResUNet (3 levels; resunet.py:16-191): encoder conv->norm->block
  saving the *post-block pre-relu* skip; decoder conv_tr->norm->block->relu
  with ME.cat skips; tail conv1_tr(k1)->relu->final(k1, bias).
  Variants: ResUNetBN, ResUNetBNF, ResUNetBNFX (:194-205).
- "v1_4" — ResUNet2 (4 levels; :419-691): same pattern one level deeper.
  Variants: ResUNetBN2/B/C/D/E/F (+CX/FX cross): the shipped checkpoints are
  ResUNetBN2C (README.md:64-67).
- "v2" — ResUNet2v2 (:694-972): relu *before* the block stack (blocks are
  torch Sequentials, possibly several per level), kaiming fan_out init.
  Variants: ResUNetBN2v2/Bv2/Cv2/Dv2/Ev2/Fv2.
- "sp3"/"sp4" — ResUNetSP (:208-416) / ResUNet2SP (:975-1217): downsample by
  k2/s2 sum-pooling + stride-1 convs; upsample by pooling-transpose (sp3) or
  strided conv_tr (sp4). Variants: ResUNetBNSPC, ResUNetINBNSPC,
  ResUNetBN2SPC, ResUNetBN2SPCX.

Parameter trees mirror MinkowskiEngine state_dict names (Sequential blocks
nest as "0", "1", ...), so torch checkpoints convert mechanically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import kernel_map
from ..ops import sparse_conv as sc
from ..ops.sparse_grid import Grid
from . import common, residual_block, unet_plan

ResUNet2Plan = unet_plan.UNetPlan
_identity_kmap = unet_plan.identity_kmap


@dataclass(frozen=True)
class ResUNetConfig:
    name: str
    family: str  # v1_3 | v1_4 | v2 | sp3 | sp4
    norm_type: str
    channels: Tuple[int, ...]
    tr_channels: Tuple[int, ...]
    block_norm_type: str = "BN"
    depths: Tuple[int, ...] = ()  # per-level Sequential block counts (v2/sp)
    region_type: int = kernel_map.HYPER_CUBE
    in_channels: int = 1
    out_channels: int = 32
    bn_momentum: float = 0.1
    conv1_kernel_size: int = 3
    normalize_feature: bool = False
    D: int = 3

    @property
    def levels(self) -> int:
        return len(self.channels) - 1


# Keep the old public name working.
ResUNet2Config = ResUNetConfig

_C3 = dict(channels=(0, 32, 64, 128), tr_channels=(0, 32, 64, 64))
_VARIANTS: Dict[str, Dict[str, Any]] = {
    # 3-level v1 (resunet.py:194-205)
    "ResUNetBN": dict(_C3, family="v1_3", norm_type="BN"),
    "ResUNetBNF": dict(family="v1_3", norm_type="BN", channels=(0, 16, 32, 64),
                       tr_channels=(0, 16, 32, 64)),
    "ResUNetBNFX": dict(family="v1_3", norm_type="BN", channels=(0, 16, 32, 64),
                        tr_channels=(0, 16, 32, 64),
                        region_type=kernel_map.HYPER_CROSS),
    # 4-level v1 (resunet.py:652-691)
    "ResUNetBN2": dict(family="v1_4", norm_type="BN", channels=(0, 32, 64, 128, 256),
                       tr_channels=(0, 32, 64, 64, 128)),
    "ResUNetBN2B": dict(family="v1_4", norm_type="BN", channels=(0, 32, 64, 128, 256),
                        tr_channels=(0, 64, 64, 64, 64)),
    "ResUNetBN2C": dict(family="v1_4", norm_type="BN", channels=(0, 32, 64, 128, 256),
                        tr_channels=(0, 64, 64, 64, 128)),
    "ResUNetBN2D": dict(family="v1_4", norm_type="BN", channels=(0, 32, 64, 128, 256),
                        tr_channels=(0, 64, 64, 128, 128)),
    "ResUNetBN2E": dict(family="v1_4", norm_type="BN", channels=(0, 128, 128, 128, 256),
                        tr_channels=(0, 64, 128, 128, 128)),
    "ResUNetBN2F": dict(family="v1_4", norm_type="BN", channels=(0, 16, 32, 64, 128),
                        tr_channels=(0, 16, 32, 64, 128)),
    # v2 (resunet.py:942-972); DEPTHS[1..L] block counts, all 1 by default
    "ResUNetBN2v2": dict(family="v2", norm_type="BN", channels=(0, 32, 64, 128, 256),
                         tr_channels=(0, 32, 64, 64, 128), depths=(1,) * 8),
    "ResUNetBN2Bv2": dict(family="v2", norm_type="BN", channels=(0, 32, 64, 128, 256),
                          tr_channels=(0, 64, 64, 64, 64), depths=(1,) * 8),
    "ResUNetBN2Cv2": dict(family="v2", norm_type="BN", channels=(0, 32, 64, 128, 256),
                          tr_channels=(0, 64, 64, 64, 128), depths=(1,) * 8),
    "ResUNetBN2Dv2": dict(family="v2", norm_type="BN", channels=(0, 32, 64, 128, 256),
                          tr_channels=(0, 64, 64, 128, 128), depths=(1,) * 8),
    "ResUNetBN2Ev2": dict(family="v2", norm_type="BN", channels=(0, 128, 128, 128, 256),
                          tr_channels=(0, 64, 128, 128, 128), depths=(1,) * 8),
    "ResUNetBN2Fv2": dict(family="v2", norm_type="BN", channels=(0, 16, 32, 64, 128),
                          tr_channels=(0, 16, 32, 64, 128), depths=(1,) * 8),
    # SP families (resunet.py:208-416, 975-1217)
    "ResUNetSP": dict(_C3, family="sp3", norm_type="BN", depths=(1,) * 6),
    "ResUNetBNSPC": dict(_C3, family="sp3", norm_type="BN", depths=(1,) * 6,
                         region_type=kernel_map.HYPER_CROSS),
    "ResUNetINBNSPC": dict(_C3, family="sp3", norm_type="INBN", depths=(1,) * 6,
                           region_type=kernel_map.HYPER_CROSS),
    "ResUNet2SP": dict(family="sp4", norm_type="BN", channels=(0, 32, 64, 128, 256),
                       tr_channels=(0, 64, 64, 64, 128), depths=(1,) * 8),
    "ResUNetBN2SPC": dict(family="sp4", norm_type="BN",
                          channels=(0, 32, 64, 128, 256),
                          tr_channels=(0, 64, 64, 64, 128), depths=(1,) * 8),
    "ResUNetBN2SPCX": dict(family="sp4", norm_type="BN",
                           channels=(0, 32, 64, 128, 256),
                           tr_channels=(0, 64, 64, 64, 128), depths=(1,) * 8,
                           region_type=kernel_map.HYPER_CROSS),
}
# Cross-region aliases of the 4-level v1 family (resunet.py:668-669, 690-691).
_VARIANTS["ResUNetBN2CX"] = dict(_VARIANTS["ResUNetBN2C"],
                                 region_type=kernel_map.HYPER_CROSS)
_VARIANTS["ResUNetBN2FX"] = dict(_VARIANTS["ResUNetBN2F"],
                                 region_type=kernel_map.HYPER_CROSS)


def make_config(name: str, in_channels: int, out_channels: int, bn_momentum: float = 0.1,
                conv1_kernel_size: int = 3, normalize_feature: bool = False,
                D: int = 3) -> ResUNetConfig:
    if name not in _VARIANTS:
        raise ValueError(f"unknown ResUNet variant {name}")
    return ResUNetConfig(name=name, in_channels=in_channels, out_channels=out_channels,
                         bn_momentum=bn_momentum, conv1_kernel_size=conv1_kernel_size,
                         normalize_feature=normalize_feature, D=D, **_VARIANTS[name])


def build_resunet2_plan(grid0: Grid, cfg: ResUNetConfig,
                        level_shrink: int = 2,
                        dense_extent=None,
                        ones_input: bool = False) -> unet_plan.UNetPlan:
    """Pyramid + kernel maps for this config's depth; see models/unet_plan.py."""
    return unet_plan.build_unet_plan(
        grid0, cfg.conv1_kernel_size, cfg.region_type, cfg.D,
        n_levels=cfg.levels, level_shrink=level_shrink,
        with_pooling=cfg.family.startswith("sp"), dense_extent=dense_extent,
        ones_input=ones_input and cfg.in_channels == 1)


build_resunet2_plan_batch = jax.vmap(build_resunet2_plan, in_axes=(0, None))


def _depth(cfg, i):
    """Block count at encoder/decoder slot i (1-based, mirrored for decoder)."""
    if not cfg.depths:
        return 1
    return cfg.depths[min(i, len(cfg.depths) - 1)]


def init(key: jax.Array, cfg: ResUNetConfig) -> Tuple[common.Params, common.Params]:
    C, TR, L = cfg.channels, cfg.tr_channels, cfg.levels
    kvol3 = kernel_map.kernel_offsets(3, cfg.D, cfg.region_type).shape[0]
    kvol1 = kernel_map.kernel_offsets(cfg.conv1_kernel_size, cfg.D,
                                      cfg.region_type).shape[0]
    seq_blocks = cfg.family in ("v2", "sp3", "sp4")
    # v2's explicit weight_initialization uses kaiming fan_out (reference
    # resunet.py:878-881); v1/SP inherit ME's fan-in default.
    fan = "out" if cfg.family == "v2" else "in"
    keys = iter(jax.random.split(key, 8 * L + 8))
    params: common.Params = {}
    state: common.Params = {}

    def add_norm(name, c):
        p, s = common.init_norm(cfg.norm_type, c)
        params[name], state[name] = p, s

    def add_block(name, c):
        if seq_blocks:
            bp, bs = {}, {}
            lvl = int(name.replace("block", "").replace("_tr", ""))
            for d in range(_depth(cfg, lvl)):
                bp[str(d)], bs[str(d)] = residual_block.init_block(
                    next(keys), cfg.block_norm_type, c, c, kvol3, fan=fan)
            params[name], state[name] = bp, bs
        else:
            params[name], state[name] = residual_block.init_block(
                next(keys), cfg.block_norm_type, c, c, kvol3, fan=fan)

    # Encoder
    params["conv1"] = common.init_conv(next(keys), kvol1, cfg.in_channels, C[1], fan=fan)
    add_norm("norm1", C[1])
    add_block("block1", C[1])
    enc_kvol = 1 if cfg.family == "sp3" else kvol3  # sp3 convs are k1 (resunet.py:50-75)
    for i in range(2, L + 1):
        params[f"conv{i}"] = common.init_conv(next(keys), enc_kvol, C[i - 1], C[i], fan=fan)
        add_norm(f"norm{i}", C[i])
        add_block(f"block{i}", C[i])
    # Decoder
    dec_kvol = 1 if cfg.family == "sp3" else kvol3
    params[f"conv{L}_tr"] = common.init_conv(next(keys), dec_kvol, C[L], TR[L], fan=fan)
    add_norm(f"norm{L}_tr", TR[L])
    add_block(f"block{L}_tr", TR[L])
    for i in range(L - 1, 1, -1):
        params[f"conv{i}_tr"] = common.init_conv(next(keys), dec_kvol,
                                                 C[i] + TR[i + 1], TR[i], fan=fan)
        add_norm(f"norm{i}_tr", TR[i])
        add_block(f"block{i}_tr", TR[i])
    params["conv1_tr"] = common.init_conv(next(keys), 1, C[1] + TR[2], TR[1], fan=fan)
    params["final"] = common.init_conv(next(keys), 1, TR[1], cfg.out_channels, bias=True, fan=fan)
    return params, state


def apply(params: common.Params, state: common.Params, cfg: ResUNetConfig,
          plan: unet_plan.UNetPlan, feats: jnp.ndarray, train: bool = False):
    """Forward pass. plan is batched, feats [B, N, Cin]. Returns (out, new_state)."""
    L = cfg.levels
    fam = cfg.family
    masks = [jax.vmap(Grid.valid_mask)(g) for g in plan.grids]
    new_state: common.Params = {}
    conv = common.apply_conv_batched
    relu = lambda x: common.apply_nonlinearity("ReLU", x)

    def norm(name, x, lvl):
        out, s = common.apply_norm(cfg.norm_type, params[name], state[name], x,
                                   masks[lvl], train, cfg.bn_momentum)
        new_state[name] = s
        return out

    def block(name, x, lvl):
        kmap = plan.self_kmaps[lvl]
        if fam in ("v2", "sp3", "sp4"):
            bstate = {}
            for d in sorted(params[name], key=int):
                x, bs = residual_block.apply_block(
                    params[name][d], state[name][d], cfg.block_norm_type, x, kmap,
                    masks[lvl], train, cfg.bn_momentum)
                bstate[d] = bs
            new_state[name] = bstate
            return x
        out, bs = residual_block.apply_block(params[name], state[name],
                                             cfg.block_norm_type, x, kmap,
                                             masks[lvl], train, cfg.bn_momentum)
        new_state[name] = bs
        return out

    def pool(kmaps, idx, x):
        return jax.vmap(sc.sparse_sum_pool)(x, kmaps[idx])

    skips = []
    out = feats
    # ---------------- encoder ----------------
    for i in range(1, L + 1):
        lvl = i - 1
        if i == 1:
            if plan.conv1_ones is not None:
                out = common.apply_conv1_ones(params["conv1"], plan.conv1_ones,
                                              out.dtype)
            else:
                out = conv(params["conv1"], out, plan.conv1_kmap)
        elif fam in ("sp3", "sp4"):
            out = pool(plan.pool_down, i - 2, out)  # SumPooling k2/s2
            kmap = unet_plan.identity_kmap_batched(plan.grids[lvl]) \
                if fam == "sp3" else plan.self_kmaps[lvl]
            out = conv(params[f"conv{i}"], out, kmap)
        else:
            out = conv(params[f"conv{i}"], out, plan.down_kmaps[i - 2])
        out = norm(f"norm{i}", out, lvl)
        if fam == "v2":  # relu before the block stack (resunet.py:887-906)
            out = block(f"block{i}", relu(out), lvl)
            skips.append(out)
        else:
            out = block(f"block{i}", out, lvl)
            skips.append(out)
            out = relu(out)

    # ---------------- decoder ----------------
    for i in range(L, 1, -1):
        lvl = i - 2
        if fam == "sp3":
            # pool_tr then k1 conv_tr at stage L; conv then pool at inner stages
            # (reference forward order quirk, resunet.py:383-395)
            if i == L:
                out = pool(plan.pool_up, lvl, out)
                out = conv(params[f"conv{i}_tr"],
                           out, unet_plan.identity_kmap_batched(plan.grids[lvl]))
            else:
                out = conv(params[f"conv{i}_tr"], out,
                           unet_plan.identity_kmap_batched(plan.grids[lvl + 1]))
                out = pool(plan.pool_up, lvl, out)
        else:
            out = conv(params[f"conv{i}_tr"], out, plan.up_kmaps[lvl])
        out = norm(f"norm{i}_tr", out, lvl)
        if fam in ("v2", "sp3", "sp4"):
            out = relu(out)
            out = block(f"block{i}_tr", out, lvl)
        else:
            out = block(f"block{i}_tr", out, lvl)
            out = relu(out)
        out = jnp.concatenate([out, skips[lvl]], axis=-1)  # ME.cat(decoder, skip)

    id_kmap = unet_plan.identity_kmap_batched(plan.grids[0])
    out = conv(params["conv1_tr"], out, id_kmap)
    out = relu(out)
    out = conv(params["final"], out, id_kmap)

    if cfg.normalize_feature:
        # normalize in f32 even under a bf16 compute path (downstream KNN
        # matching needs f32 features; see ops/knn.py precision note)
        out = out.astype(jnp.float32)
        # sqrt(max(sum(x^2), eps)) instead of linalg.norm: norm's gradient at
        # an exactly-zero row (padding) is 0/0 = NaN, and NaN * 0 cotangent
        # still contaminates the final kernel's grads under self-training.
        n2 = jnp.sum(out * out, axis=-1, keepdims=True)
        out = out / (jnp.sqrt(jnp.maximum(n2, 1e-24)) + 1e-8)
    return out, new_state
