"""PyramidNet family — recursive hourglass nets (model/pyramidnet.py:15-193).

Each PyramidModule = strided conv-norm-ELU + `depth` residual blocks + inner
module + transposed conv-norm-ELU + ME.cat(x, y) + 1x1 conv-norm-ELU
(pyramidnet.py:74-80); the net stacks modules innermost-out over
len(DEPTHS) levels under a conv1 head and a conv3+conv1 tail.

Parameter nesting mirrors the torch Sequential state_dict names exactly
("conv.0.kernel", "convtr.1.bn.weight", "inner_module....") so the checkpoint
converter is a direct re-nesting.

BN-momentum quirk preserved: conv_norm_non defaults to bn_momentum=0.05
(residual_block.py:177) and the reference only passes the configured momentum
to the head conv, the convtr norm, and block norms — cat_conv and the tail keep
the 0.05 default.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import kernel_map
from ..ops.sparse_grid import Grid
from . import common, residual_block, unet_plan

_DEFAULT_MOMENTUM = 0.05


@dataclass(frozen=True)
class PyramidNetConfig:
    name: str
    norm_type: str
    channels: Tuple[int, ...]
    tr_channels: Tuple[int, ...]
    depths: Tuple[int, ...]
    in_channels: int = 1
    out_channels: int = 32
    bn_momentum: float = 0.1
    conv1_kernel_size: int = 3
    normalize_feature: bool = False
    D: int = 3
    region_type: int = kernel_map.HYPER_CUBE
    nonlinearity: str = "ELU"

    @property
    def levels(self) -> int:
        return len(self.depths)


_VARIANTS: Dict[str, Dict[str, Any]] = {
    "PyramidNet": dict(norm_type="BN", channels=(32, 64, 128, 128),
                       tr_channels=(64, 128, 128, 128), depths=(1, 1, 1, 1)),
    "PyramidNet6": dict(norm_type="BN", channels=(32, 64, 128, 192, 256, 256),
                        tr_channels=(64, 128, 192, 192, 256, 256),
                        depths=(1, 1, 1, 1, 1, 1)),
    "PyramidNet6NoBlock": dict(norm_type="BN", channels=(32, 64, 128, 192, 256, 256),
                               tr_channels=(64, 128, 192, 192, 256, 256),
                               depths=(0, 0, 0, 0, 0, 0)),
    "PyramidNet6INBN": dict(norm_type="INBN", channels=(32, 64, 128, 192, 256, 256),
                            tr_channels=(64, 128, 192, 192, 256, 256),
                            depths=(1, 1, 1, 1, 1, 1)),
    "PyramidNet8": dict(norm_type="BN", channels=(32, 64, 128, 128, 192, 192, 256, 256),
                        tr_channels=(64, 128, 128, 192, 192, 192, 256, 256),
                        depths=(1, 1, 1, 1, 1, 1, 1, 1)),
    "PyramidNet8INBN": dict(norm_type="INBN",
                            channels=(32, 64, 128, 128, 192, 192, 256, 256),
                            tr_channels=(64, 128, 128, 192, 192, 192, 256, 256),
                            depths=(1, 1, 1, 1, 1, 1, 1, 1)),
}


def make_config(name: str, in_channels: int, out_channels: int, bn_momentum: float = 0.1,
                conv1_kernel_size: int = 3, normalize_feature: bool = False,
                D: int = 3) -> PyramidNetConfig:
    if name not in _VARIANTS:
        raise ValueError(f"unknown PyramidNet variant {name}")
    return PyramidNetConfig(name=name, in_channels=in_channels,
                            out_channels=out_channels, bn_momentum=bn_momentum,
                            conv1_kernel_size=conv1_kernel_size,
                            normalize_feature=normalize_feature, D=D, **_VARIANTS[name])


def build_plan(grid0: Grid, cfg: PyramidNetConfig, level_shrink: int = 2,
               dense_extent=None, ones_input: bool = False):
    # ones_input accepted for interface parity; the pyramid entry stage fuses
    # conv1 with its norm/nonlinearity so the occupancy shortcut is not used.
    return unet_plan.build_unet_plan(grid0, cfg.conv1_kernel_size, cfg.region_type,
                                     cfg.D, n_levels=cfg.levels,
                                     level_shrink=level_shrink,
                                     dense_extent=dense_extent)


def _init_cnn(key, kvol, cin, cout, norm_type):
    """conv_norm_non parameters (residual_block.py:171-191): {'0': conv, '1': norm}."""
    np_, ns = common.init_norm(norm_type, cout)
    return {"0": common.init_conv(key, kvol, cin, cout), "1": np_}, {"1": ns}


def _init_module(keys, cfg, level):
    """PyramidModule params at pyramid level (0 = outermost)."""
    C, TR, depths = cfg.channels, cfg.tr_channels, cfg.depths
    kvol3 = kernel_map.kernel_offsets(3, cfg.D, cfg.region_type).shape[0]
    inc, outc = C[level], TR[level]
    inner_inc, inner_outc = C[level + 1], TR[level + 1]

    # self.conv = Sequential(conv_norm_non, *blocks): the conv_norm_non is the
    # nested element "0" (torch names conv.0.0.kernel / conv.0.1.bn.*).
    cnn_p, cnn_s = _init_cnn(next(keys), kvol3, inc, inner_inc, cfg.norm_type)
    conv_p: Dict[str, Any] = {"0": cnn_p}
    conv_s: Dict[str, Any] = {"0": cnn_s}
    for d in range(depths[level + 1]):
        bp, bs = residual_block.init_block(next(keys), cfg.norm_type, inner_inc,
                                           inner_inc, kvol3)
        conv_p[str(d + 1)] = bp
        conv_s[str(d + 1)] = bs
    tr_np, tr_ns = common.init_norm(cfg.norm_type, inner_outc)
    convtr_p = {"0": common.init_conv(next(keys), kvol3, inner_outc, inner_outc),
                "1": tr_np}
    convtr_s = {"1": tr_ns}
    cat_p, cat_s = _init_cnn(next(keys), 1, inner_outc + inc, outc, cfg.norm_type)
    params = {"conv": conv_p, "convtr": convtr_p, "cat_conv": cat_p}
    state = {"conv": conv_s, "convtr": convtr_s, "cat_conv": cat_s}
    if level + 1 < cfg.levels - 1:
        ip, is_ = _init_module(keys, cfg, level + 1)
        params["inner_module"] = ip
        state["inner_module"] = is_
    return params, state


def init(key: jax.Array, cfg: PyramidNetConfig):
    kvol1 = kernel_map.kernel_offsets(cfg.conv1_kernel_size, cfg.D,
                                      cfg.region_type).shape[0]
    kvol3 = kernel_map.kernel_offsets(3, cfg.D, cfg.region_type).shape[0]
    keys = iter(jax.random.split(key, 4 * cfg.levels + 8))
    params: common.Params = {}
    state: common.Params = {}
    params["conv"], state["conv"] = _init_cnn(next(keys), kvol1, cfg.in_channels,
                                              cfg.channels[0], cfg.norm_type)
    params["pyramid"], state["pyramid"] = _init_module(keys, cfg, 0)
    f0p, f0s = _init_cnn(next(keys), kvol3, cfg.tr_channels[0], cfg.tr_channels[0],
                         cfg.norm_type)
    params["final"] = {"0": f0p,
                       "1": common.init_conv(next(keys), 1, cfg.tr_channels[0],
                                             cfg.out_channels)}
    state["final"] = {"0": f0s}
    return params, state


def _apply_cnn(params, state, norm_type, feats, kmap, mask, train, momentum,
               nonlinearity):
    out = common.apply_conv_batched(params["0"], feats, kmap)
    out, s = common.apply_norm(norm_type, params["1"], state["1"], out, mask,
                               train, momentum)
    return common.apply_nonlinearity(nonlinearity, out), {"1": s}


def _apply_module(params, state, cfg, plan, masks, x, level, train):
    """PyramidModule forward (pyramidnet.py:74-80)."""
    new_state: common.Params = {}
    # down conv-norm-ELU + blocks (nested element "0", see _init_module)
    y, cs = _apply_cnn(params["conv"]["0"], state["conv"]["0"], cfg.norm_type, x,
                       plan.down_kmaps[level], masks[level + 1], train,
                       _DEFAULT_MOMENTUM, cfg.nonlinearity)
    conv_state = {"0": cs}
    for d in range(cfg.depths[level + 1]):
        y, bs = residual_block.apply_block(params["conv"][str(d + 1)],
                                           state["conv"][str(d + 1)], cfg.norm_type,
                                           y, plan.self_kmaps[level + 1],
                                           masks[level + 1], train, cfg.bn_momentum)
        conv_state[str(d + 1)] = bs
    new_state["conv"] = conv_state
    if "inner_module" in params:
        y, is_ = _apply_module(params["inner_module"], state["inner_module"], cfg,
                               plan, masks, y, level + 1, train)
        new_state["inner_module"] = is_
    # up conv-norm-ELU
    y = common.apply_conv_batched(params["convtr"]["0"], y, plan.up_kmaps[level])
    y, ts = common.apply_norm(cfg.norm_type, params["convtr"]["1"],
                              state["convtr"]["1"], y, masks[level], train,
                              cfg.bn_momentum)
    y = common.apply_nonlinearity(cfg.nonlinearity, y)
    new_state["convtr"] = {"1": ts}
    # ME.cat(x, y) — x first (pyramidnet.py:79) — then 1x1 conv-norm-ELU
    y = jnp.concatenate([x, y], axis=-1)
    id_kmap = jax.vmap(unet_plan.identity_kmap)(plan.grids[level])
    y, cc = _apply_cnn(params["cat_conv"], state["cat_conv"], cfg.norm_type, y,
                       id_kmap, masks[level], train, _DEFAULT_MOMENTUM,
                       cfg.nonlinearity)
    new_state["cat_conv"] = cc
    return y, new_state


def apply(params, state, cfg: PyramidNetConfig, plan, feats: jnp.ndarray,
          train: bool = False):
    masks = [jax.vmap(Grid.valid_mask)(g) for g in plan.grids]
    new_state: common.Params = {}
    out, cs = _apply_cnn(params["conv"], state["conv"], cfg.norm_type, feats,
                         plan.conv1_kmap, masks[0], train, cfg.bn_momentum,
                         cfg.nonlinearity)
    new_state["conv"] = cs
    out, ps = _apply_module(params["pyramid"], state["pyramid"], cfg, plan, masks,
                            out, 0, train)
    new_state["pyramid"] = ps
    out, fs = _apply_cnn(params["final"]["0"], state["final"]["0"], cfg.norm_type,
                         out, plan.self_kmaps[0], masks[0], train,
                         _DEFAULT_MOMENTUM, cfg.nonlinearity)
    id_kmap = jax.vmap(unet_plan.identity_kmap)(plan.grids[0])
    out = common.apply_conv_batched(params["final"]["1"], out, id_kmap)
    new_state["final"] = {"0": fs}

    if cfg.normalize_feature:
        # clamped sum-of-squares: linalg.norm's grad at a zero (padding) row
        # is NaN (see resunet.py final normalize)
        n2 = jnp.sum(out * out, axis=-1, keepdims=True)
        out = out / (jnp.sqrt(jnp.maximum(n2, 1e-24)) + 1e-8)
    return out, new_state
