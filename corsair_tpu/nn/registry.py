"""Model registry: name -> (config factory) lookup.

Parity with ``model/__init__.py:23-48`` (``MODELS``/``load_model``): the
reference registers every class whose name contains "Net"/"MLP" from
simpleunet, resunet and fc. Here models are functional, so the registry maps
a name to a small descriptor with ``make_config`` / ``init`` / ``forward``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

from corsair_tpu.nn import resunet as _resunet
from corsair_tpu.nn import simpleunet as _simpleunet


@dataclasses.dataclass(frozen=True)
class ModelDef:
    name: str
    make_config: Callable[..., Any]
    init: Callable[..., Any]
    forward: Callable[..., Any]
    family: str


MODELS: Dict[str, ModelDef] = {}


def _register_resunets():
    for name in _resunet._VARIANTS:
        def make_cfg(name=name, **kw):
            return _resunet.make_config(name, **kw)
        MODELS[name] = ModelDef(
            name=name,
            make_config=make_cfg,
            init=_resunet.init_params,
            forward=_resunet.forward,
            family="resunet",
        )


def _register_simpleunets():
    for name in _simpleunet.VARIANTS:
        def make_cfg(name=name, **kw):
            return _simpleunet.make_config(name, **kw)
        MODELS[name] = ModelDef(
            name=name,
            make_config=make_cfg,
            init=_simpleunet.init_params,
            forward=_simpleunet.forward,
            family="simpleunet",
        )


def _register_resnets():
    from corsair_tpu.nn import resnet as _resnet

    for name in _resnet.VARIANTS:
        def make_cfg(name=name, **kw):
            return _resnet.make_config(name, **kw)
        MODELS[name] = ModelDef(
            name=name,
            make_config=make_cfg,
            init=_resnet.init_params,
            forward=_resnet.forward,
            family="resnet",
        )


def _register_heads():
    """The reference's add_models(fc) registers the NetVLAD heads too
    (class names containing "Net", ``model/__init__.py:23-31``)."""
    from corsair_tpu.nn import heads as _heads

    MODELS["NetVLAD"] = ModelDef(
        name="NetVLAD",
        make_config=lambda **kw: kw,
        init=lambda key, cfg: _heads.netvlad_init(key, **cfg),
        forward=lambda params, feats, batch, valid, nb:
            _heads.netvlad_apply(params, feats, batch, valid, nb),
        family="head",
    )
    MODELS["NetVLADLoupe"] = ModelDef(
        name="NetVLADLoupe",
        make_config=lambda **kw: kw,
        init=lambda key, cfg: _heads.netvlad_loupe_init(key, **cfg),
        forward=lambda params, feats, batch, valid, nb:
            _heads.netvlad_loupe_apply(params, feats, batch, valid, nb),
        family="head",
    )


_register_resunets()
_register_simpleunets()
_register_resnets()
_register_heads()


def load_model(name: str) -> ModelDef:
    if name not in MODELS:
        opts = ", ".join(sorted(MODELS))
        raise KeyError(f"Invalid model {name!r}. Options: {opts}")
    return MODELS[name]
