"""SimpleNet family — non-residual encoder-decoder U-Nets (model/simpleunet.py).

Three depths sharing one skeleton: at each encoder level conv(+stride 2 past
level 1) + norm + relu saving the pre-relu output for the skip; decoder
transposed convs with ME.cat skips; tail = conv1_tr (k3, s1) + norm + relu +
final (k1, bias). Unlike ResUNet2 there are no residual blocks and the tail
conv has kernel size 3 with its own norm (simpleunet.py:82-99, 249-267).

Depths / variants (simpleunet.py:13-16, 140-160, 318-351, 354-357, 531-564):
- SimpleNet  (2 downsamples):  SimpleNetIN/BN/BNE/INE
- SimpleNet2 (3 downsamples):  SimpleNetIN2/BN2/BN2B/BN2C/BN2D/BN2E/IN2E
- SimpleNet3 (4 downsamples):  SimpleNetIN3/BN3/BN3B/BN3C/BN3D/BN3E/IN3E
(SimpleNetBN2C is the default --feat_model in config.py:77, though the shipped
checkpoints use ResUNetBN2C.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import kernel_map
from ..ops.sparse_grid import Grid
from . import common, unet_plan


@dataclass(frozen=True)
class SimpleNetConfig:
    name: str
    norm_type: str
    channels: Tuple[int, ...]  # [0, c1, ..., cL]
    tr_channels: Tuple[int, ...]
    in_channels: int = 1
    out_channels: int = 32
    bn_momentum: float = 0.1
    conv1_kernel_size: int = 3
    normalize_feature: bool = False
    D: int = 3
    region_type: int = kernel_map.HYPER_CUBE

    @property
    def levels(self) -> int:
        return len(self.channels) - 1


_BASE1 = dict(channels=(0, 32, 64, 128), tr_channels=(0, 32, 32, 64))
_BASE1E = dict(channels=(0, 16, 32, 32), tr_channels=(0, 16, 16, 32))
_BASE2 = dict(channels=(0, 32, 64, 128, 256), tr_channels=(0, 32, 32, 64, 64))
_BASE3 = dict(channels=(0, 32, 64, 128, 256, 512), tr_channels=(0, 32, 32, 64, 64, 128))

_VARIANTS: Dict[str, Dict[str, Any]] = {
    "SimpleNetIN": dict(_BASE1, norm_type="IN"),
    "SimpleNetBN": dict(_BASE1, norm_type="BN"),
    "SimpleNetBNE": dict(_BASE1E, norm_type="BN"),
    "SimpleNetINE": dict(_BASE1E, norm_type="IN"),
    "SimpleNetIN2": dict(_BASE2, norm_type="IN"),
    "SimpleNetBN2": dict(_BASE2, norm_type="BN"),
    "SimpleNetBN2B": dict(norm_type="BN", channels=(0, 32, 64, 128, 256),
                          tr_channels=(0, 64, 64, 64, 64)),
    "SimpleNetBN2C": dict(norm_type="BN", channels=(0, 32, 64, 128, 256),
                          tr_channels=(0, 32, 64, 64, 128)),
    "SimpleNetBN2D": dict(norm_type="BN", channels=(0, 32, 64, 128, 256),
                          tr_channels=(0, 32, 64, 64, 128)),
    "SimpleNetBN2E": dict(norm_type="BN", channels=(0, 16, 32, 64, 128),
                          tr_channels=(0, 16, 32, 32, 64)),
    "SimpleNetIN2E": dict(norm_type="IN", channels=(0, 16, 32, 64, 128),
                          tr_channels=(0, 16, 32, 32, 64)),
    "SimpleNetIN3": dict(_BASE3, norm_type="IN"),
    "SimpleNetBN3": dict(_BASE3, norm_type="BN"),
    "SimpleNetBN3B": dict(norm_type="BN", channels=(0, 32, 64, 128, 256, 512),
                          tr_channels=(0, 64, 64, 64, 64, 128)),
    "SimpleNetBN3C": dict(norm_type="BN", channels=(0, 32, 64, 128, 256, 512),
                          tr_channels=(0, 32, 64, 64, 128, 128)),
    "SimpleNetBN3D": dict(norm_type="BN", channels=(0, 32, 64, 128, 256, 512),
                          tr_channels=(0, 32, 64, 64, 128, 128)),
    "SimpleNetBN3E": dict(norm_type="BN", channels=(0, 16, 32, 64, 128, 256),
                          tr_channels=(0, 16, 32, 32, 64, 128)),
    "SimpleNetIN3E": dict(norm_type="IN", channels=(0, 16, 32, 64, 128, 256),
                          tr_channels=(0, 16, 32, 32, 64, 128)),
}


def make_config(name: str, in_channels: int, out_channels: int, bn_momentum: float = 0.1,
                conv1_kernel_size: int = 3, normalize_feature: bool = False,
                D: int = 3) -> SimpleNetConfig:
    if name not in _VARIANTS:
        raise ValueError(f"unknown SimpleNet variant {name}")
    return SimpleNetConfig(name=name, in_channels=in_channels, out_channels=out_channels,
                           bn_momentum=bn_momentum, conv1_kernel_size=conv1_kernel_size,
                           normalize_feature=normalize_feature, D=D, **_VARIANTS[name])


def build_plan(grid0: Grid, cfg: SimpleNetConfig, level_shrink: int = 2,
               dense_extent=None, ones_input: bool = False):
    return unet_plan.build_unet_plan(grid0, cfg.conv1_kernel_size, cfg.region_type,
                                     cfg.D, n_levels=cfg.levels,
                                     level_shrink=level_shrink,
                                     dense_extent=dense_extent,
                                     ones_input=ones_input and cfg.in_channels == 1)


def init(key: jax.Array, cfg: SimpleNetConfig):
    C, TR = cfg.channels, cfg.tr_channels
    L = cfg.levels
    kvol3 = kernel_map.kernel_offsets(3, cfg.D, cfg.region_type).shape[0]
    kvol1 = kernel_map.kernel_offsets(cfg.conv1_kernel_size, cfg.D, cfg.region_type).shape[0]
    keys = iter(jax.random.split(key, 2 * L + 2))
    params: common.Params = {}
    state: common.Params = {}

    def add_norm(name, c):
        p, s = common.init_norm(cfg.norm_type, c)
        params[name], state[name] = p, s

    params["conv1"] = common.init_conv(next(keys), kvol1, cfg.in_channels, C[1])
    add_norm("norm1", C[1])
    for i in range(2, L + 1):
        params[f"conv{i}"] = common.init_conv(next(keys), kvol3, C[i - 1], C[i])
        add_norm(f"norm{i}", C[i])
    params[f"conv{L}_tr"] = common.init_conv(next(keys), kvol3, C[L], TR[L])
    add_norm(f"norm{L}_tr", TR[L])
    for i in range(L - 1, 1, -1):
        params[f"conv{i}_tr"] = common.init_conv(next(keys), kvol3, C[i] + TR[i + 1], TR[i])
        add_norm(f"norm{i}_tr", TR[i])
    params["conv1_tr"] = common.init_conv(next(keys), kvol3, C[1] + TR[2], TR[1])
    add_norm("norm1_tr", TR[1])
    params["final"] = common.init_conv(next(keys), 1, TR[1], cfg.out_channels, bias=True)
    return params, state


def apply(params, state, cfg: SimpleNetConfig, plan, feats: jnp.ndarray,
          train: bool = False):
    """Forward (simpleunet.py:101-137 / 269-315): encoder relu chain saving
    pre-relu skips, decoder with ME.cat; feats [B, N, Cin]."""
    L = cfg.levels
    masks = [jax.vmap(Grid.valid_mask)(g) for g in plan.grids]
    new_state: common.Params = {}

    def norm(name, x, lvl):
        out, s = common.apply_norm(cfg.norm_type, params[name], state[name], x,
                                   masks[lvl], train, cfg.bn_momentum)
        new_state[name] = s
        return out

    conv = common.apply_conv_batched
    relu = lambda x: common.apply_nonlinearity("ReLU", x)

    skips = []
    out = feats
    for i in range(1, L + 1):
        if i == 1 and plan.conv1_ones is not None:
            out = common.apply_conv1_ones(params["conv1"], plan.conv1_ones,
                                          out.dtype)
        else:
            kmap = plan.conv1_kmap if i == 1 else plan.down_kmaps[i - 2]
            out = conv(params[f"conv{i}"], out, kmap)
        out = norm(f"norm{i}", out, i - 1)
        skips.append(out)  # pre-relu skip (simpleunet.py:102-112)
        out = relu(out)

    for i in range(L, 1, -1):
        out = conv(params[f"conv{i}_tr"], out, plan.up_kmaps[i - 2])
        out = norm(f"norm{i}_tr", out, i - 2)
        out = relu(out)
        out = jnp.concatenate([out, skips[i - 2]], axis=-1)  # ME.cat

    out = conv(params["conv1_tr"], out, plan.self_kmaps[0])
    out = norm("norm1_tr", out, 0)
    out = relu(out)
    id_kmap = jax.vmap(unet_plan.identity_kmap)(plan.grids[0])
    out = conv(params["final"], out, id_kmap)

    if cfg.normalize_feature:
        # clamped sum-of-squares: linalg.norm's grad at a zero (padding) row
        # is NaN even under the outer maximum (see resunet.py final normalize)
        n2 = jnp.sum(out * out, axis=-1, keepdims=True)
        out = out / jnp.maximum(jnp.sqrt(jnp.maximum(n2, 1e-24)), 1e-12)
    return out, new_state
