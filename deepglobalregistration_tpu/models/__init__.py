"""Model registry: name -> (config factory, init, apply, plan builder).

Mirrors model/__init__.py:24-38 ``load_model`` — the reference harvests classes
whose names contain 'Net' or 'MLP'; here each family registers its variants
explicitly. All models share one functional interface:

    spec = load_model("ResUNetBN2C")
    cfg = spec.make_config(in_channels, out_channels, bn_momentum=...,
                           conv1_kernel_size=..., normalize_feature=..., D=...)
    params, state = spec.init(key, cfg)
    plan = jax.vmap(spec.build_plan, in_axes=(0, None))(grid0, cfg)
    feats, new_state = spec.apply(params, state, cfg, plan, feats, train=...)
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from . import pyramidnet, resunet, simpleunet


class ModelSpec(NamedTuple):
    name: str
    make_config: Callable
    init: Callable
    apply: Callable
    build_plan: Callable


MODELS = {}


def _register(module, name: str, build_plan):
    MODELS[name] = ModelSpec(
        name=name,
        make_config=lambda *a, _n=name, **kw: module.make_config(_n, *a, **kw),
        init=module.init,
        apply=module.apply,
        build_plan=build_plan,
    )


for _name in resunet._VARIANTS:
    _register(resunet, _name, resunet.build_resunet2_plan)
for _name in simpleunet._VARIANTS:
    _register(simpleunet, _name, simpleunet.build_plan)
for _name in pyramidnet._VARIANTS:
    _register(pyramidnet, _name, pyramidnet.build_plan)


def load_model(name: str) -> ModelSpec:
    """Fetch a registered model by name (model/__init__.py:24-38)."""
    if name not in MODELS:
        raise ValueError(f"model {name} not found; known: {sorted(MODELS)}")
    return MODELS[name]
