"""ResUNet2 family — the shipped FCGF feature net and 6D inlier net.

Rebuilds model/resunet.py:419-691 (ResUNet2 / BN2 / BN2B / BN2C / BN2D / BN2E /
BN2F and the HYPER_CROSS *X variants) as functional param pytrees over the
gather-GEMM sparse conv engine. ResUNetBN2C is the architecture of both shipped
checkpoints (README.md:64-67).

Architecture (model/resunet.py:598-649): 4-level U-Net; at each encoder level a
(strided) conv + norm + residual block, saving the *pre-ReLU* block output for
the skip connection; decoder mirrors with transposed convs and feature concat
(ME.cat) on the shared coordinate map; head = 1x1 conv + ReLU + 1x1 conv with
bias; optional L2 feature normalization (resunet.py:643-649).

The coordinate pyramid + kernel maps for one input cloud are precomputed by
``build_resunet2_plan`` (single cloud; vmap for batch) — the analogue of ME's
coordinate-manager caching, rebuilt per cloud because coordinates change per
input.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import hashing, kernel_map, sparse_grid
from ..ops.sparse_grid import Grid
from . import common, residual_block


@dataclass(frozen=True)
class ResUNet2Config:
    """Static architecture description (class attrs of model/resunet.py:419-424)."""

    name: str = "ResUNetBN2C"
    norm_type: str = "BN"
    block_norm_type: str = "BN"
    channels: Tuple[int, ...] = (0, 32, 64, 128, 256)
    tr_channels: Tuple[int, ...] = (0, 64, 64, 64, 128)
    region_type: int = kernel_map.HYPER_CUBE
    in_channels: int = 1
    out_channels: int = 32
    bn_momentum: float = 0.1
    conv1_kernel_size: int = 3
    normalize_feature: bool = False
    D: int = 3


# Channel configurations from model/resunet.py:652-691.
_VARIANTS: Dict[str, Dict[str, Any]] = {
    "ResUNetBN2": dict(channels=(0, 32, 64, 128, 256), tr_channels=(0, 32, 64, 64, 128)),
    "ResUNetBN2B": dict(channels=(0, 32, 64, 128, 256), tr_channels=(0, 64, 64, 64, 64)),
    "ResUNetBN2C": dict(channels=(0, 32, 64, 128, 256), tr_channels=(0, 64, 64, 64, 128)),
    "ResUNetBN2D": dict(channels=(0, 32, 64, 128, 256), tr_channels=(0, 64, 64, 128, 128)),
    "ResUNetBN2E": dict(channels=(0, 128, 128, 128, 256), tr_channels=(0, 64, 128, 128, 128)),
    "ResUNetBN2F": dict(channels=(0, 16, 32, 64, 128), tr_channels=(0, 16, 32, 64, 128)),
}
_VARIANTS["ResUNetBN2CX"] = dict(_VARIANTS["ResUNetBN2C"], region_type=kernel_map.HYPER_CROSS)
_VARIANTS["ResUNetBN2FX"] = dict(_VARIANTS["ResUNetBN2F"], region_type=kernel_map.HYPER_CROSS)


def make_config(name: str, in_channels: int, out_channels: int, bn_momentum: float = 0.1,
                conv1_kernel_size: int = 3, normalize_feature: bool = False,
                D: int = 3) -> ResUNet2Config:
    if name not in _VARIANTS:
        raise ValueError(f"unknown ResUNet2 variant {name}")
    return ResUNet2Config(name=name, in_channels=in_channels, out_channels=out_channels,
                          bn_momentum=bn_momentum, conv1_kernel_size=conv1_kernel_size,
                          normalize_feature=normalize_feature, D=D, **_VARIANTS[name])


class ResUNet2Plan(NamedTuple):
    """Per-cloud coordinate pyramid and kernel maps (levels 0..3, strides 1,2,4,8)."""

    grids: Tuple[Grid, Grid, Grid, Grid]
    conv1_kmap: jnp.ndarray  # [K1, N] at level 0
    self_kmaps: Tuple[jnp.ndarray, ...]  # k3 stride-1 maps at levels 0..3
    down_kmaps: Tuple[jnp.ndarray, ...]  # level i -> i+1, i in 0..2
    up_kmaps: Tuple[jnp.ndarray, ...]  # level i+1 -> i, i in 0..2


def _identity_kmap(grid: Grid) -> jnp.ndarray:
    idx = jnp.arange(grid.capacity, dtype=jnp.int32)
    return jnp.where(grid.valid_mask(), idx, -1)[None, :]


def build_resunet2_plan(grid0: Grid, cfg: ResUNet2Config,
                        level_shrink: int = 2) -> ResUNet2Plan:
    """Build the 4-level pyramid + all kernel maps for one input cloud (jittable).

    level_shrink: static per-level capacity divisor. Surface scans merge ~4-8x
    voxels per stride-2 level, so padded buffers at coarse levels can shrink;
    the default 2 is conservative. Use 1 for worst-case (no-merge) inputs.
    """
    d = cfg.D
    offs3 = kernel_map.kernel_offsets(3, d, cfg.region_type)
    offs1 = kernel_map.kernel_offsets(cfg.conv1_kernel_size, d, cfg.region_type)

    grids = [grid0]
    for level in range(1, 4):
        cap = max(grid0.capacity // (level_shrink ** level), 128)
        grids.append(sparse_grid.stride_down(grids[-1], 2 ** level, out_capacity=cap))

    tables = [hashing.build_table(g.coords, g.num) for g in grids]

    conv1_kmap = kernel_map.build_kernel_map(tables[0], grids[0], offs1, unit=1)
    self_kmaps = tuple(
        kernel_map.build_kernel_map(tables[i], grids[i], offs3, unit=2 ** i)
        for i in range(4))
    down_kmaps = tuple(
        kernel_map.build_kernel_map(tables[i], grids[i + 1], offs3, unit=2 ** i)
        for i in range(3))
    up_kmaps = tuple(
        kernel_map.build_kernel_map(tables[i + 1], grids[i], offs3, unit=2 ** i,
                                    transpose=True)
        for i in range(3))
    return ResUNet2Plan(grids=tuple(grids), conv1_kmap=conv1_kmap,
                        self_kmaps=self_kmaps, down_kmaps=down_kmaps, up_kmaps=up_kmaps)


build_resunet2_plan_batch = jax.vmap(build_resunet2_plan, in_axes=(0, None))


def init(key: jax.Array, cfg: ResUNet2Config) -> Tuple[common.Params, common.Params]:
    """Initialize (params, state) pytrees with reference layer names."""
    C, TR = cfg.channels, cfg.tr_channels
    kvol3 = kernel_map.kernel_offsets(3, cfg.D, cfg.region_type).shape[0]
    kvol1 = kernel_map.kernel_offsets(cfg.conv1_kernel_size, cfg.D, cfg.region_type).shape[0]
    keys = iter(jax.random.split(key, 16))
    params: common.Params = {}
    state: common.Params = {}

    def add_norm(name, c):
        p, s = common.init_norm(cfg.norm_type, c)
        params[name] = p
        state[name] = s

    def add_block(name, cin, c):
        p, s = residual_block.init_block(next(keys), cfg.block_norm_type, cin, c, kvol3)
        params[name] = p
        state[name] = s

    params["conv1"] = common.init_conv(next(keys), kvol1, cfg.in_channels, C[1])
    add_norm("norm1", C[1])
    add_block("block1", C[1], C[1])
    for i, lvl in ((2, 2), (3, 3), (4, 4)):
        params[f"conv{i}"] = common.init_conv(next(keys), kvol3, C[i - 1], C[i])
        add_norm(f"norm{i}", C[i])
        add_block(f"block{i}", C[i], C[i])
    params["conv4_tr"] = common.init_conv(next(keys), kvol3, C[4], TR[4])
    add_norm("norm4_tr", TR[4])
    add_block("block4_tr", TR[4], TR[4])
    params["conv3_tr"] = common.init_conv(next(keys), kvol3, C[3] + TR[4], TR[3])
    add_norm("norm3_tr", TR[3])
    add_block("block3_tr", TR[3], TR[3])
    params["conv2_tr"] = common.init_conv(next(keys), kvol3, C[2] + TR[3], TR[2])
    add_norm("norm2_tr", TR[2])
    add_block("block2_tr", TR[2], TR[2])
    params["conv1_tr"] = common.init_conv(next(keys), 1, C[1] + TR[2], TR[1])
    params["final"] = common.init_conv(next(keys), 1, TR[1], cfg.out_channels, bias=True)
    return params, state


def apply(params: common.Params, state: common.Params, cfg: ResUNet2Config,
          plan: ResUNet2Plan, feats: jnp.ndarray, train: bool = False):
    """Forward pass. plan is batched (via build_resunet2_plan_batch), feats [B, N, Cin].

    Returns (features [B, N, out_channels], new_state). Mirrors
    model/resunet.py:598-649 exactly (pre-ReLU skip saves, ME.cat orders).
    """
    masks = [jax.vmap(Grid.valid_mask)(g) for g in plan.grids]
    new_state: common.Params = {}

    def norm(name, x, lvl):
        out, s = common.apply_norm(cfg.norm_type, params[name], state[name], x,
                                   masks[lvl], train, cfg.bn_momentum)
        new_state[name] = s
        return out

    def block(name, x, kmap, lvl):
        out, s = residual_block.apply_block(params[name], state[name], cfg.block_norm_type,
                                            x, kmap, masks[lvl], train, cfg.bn_momentum)
        new_state[name] = s
        return out

    conv = common.apply_conv_batched

    # Encoder
    out_s1 = conv(params["conv1"], feats, plan.conv1_kmap)
    out_s1 = norm("norm1", out_s1, 0)
    out_s1 = block("block1", out_s1, plan.self_kmaps[0], 0)
    out = common.apply_nonlinearity("ReLU", out_s1)

    out_s2 = conv(params["conv2"], out, plan.down_kmaps[0])
    out_s2 = norm("norm2", out_s2, 1)
    out_s2 = block("block2", out_s2, plan.self_kmaps[1], 1)
    out = common.apply_nonlinearity("ReLU", out_s2)

    out_s4 = conv(params["conv3"], out, plan.down_kmaps[1])
    out_s4 = norm("norm3", out_s4, 2)
    out_s4 = block("block3", out_s4, plan.self_kmaps[2], 2)
    out = common.apply_nonlinearity("ReLU", out_s4)

    out_s8 = conv(params["conv4"], out, plan.down_kmaps[2])
    out_s8 = norm("norm4", out_s8, 3)
    out_s8 = block("block4", out_s8, plan.self_kmaps[3], 3)
    out = common.apply_nonlinearity("ReLU", out_s8)

    # Decoder
    out = conv(params["conv4_tr"], out, plan.up_kmaps[2])
    out = norm("norm4_tr", out, 2)
    out = block("block4_tr", out, plan.self_kmaps[2], 2)
    out_s4_tr = common.apply_nonlinearity("ReLU", out)

    out = jnp.concatenate([out_s4_tr, out_s4], axis=-1)  # ME.cat (resunet.py:624)
    out = conv(params["conv3_tr"], out, plan.up_kmaps[1])
    out = norm("norm3_tr", out, 1)
    out = block("block3_tr", out, plan.self_kmaps[1], 1)
    out_s2_tr = common.apply_nonlinearity("ReLU", out)

    out = jnp.concatenate([out_s2_tr, out_s2], axis=-1)
    out = conv(params["conv2_tr"], out, plan.up_kmaps[0])
    out = norm("norm2_tr", out, 0)
    out = block("block2_tr", out, plan.self_kmaps[0], 0)
    out_s1_tr = common.apply_nonlinearity("ReLU", out)

    out = jnp.concatenate([out_s1_tr, out_s1], axis=-1)
    id_kmap = jax.vmap(_identity_kmap)(plan.grids[0])
    out = conv(params["conv1_tr"], out, id_kmap)
    out = common.apply_nonlinearity("ReLU", out)
    out = conv(params["final"], out, id_kmap)

    if cfg.normalize_feature:
        out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)
    return out, new_state
