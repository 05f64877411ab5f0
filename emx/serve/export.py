"""Frozen-artifact export/load — the deployment seam.

Replaces the reference's frozen-graph workflow
(tf_utility/freeze_graph.py:10-59, retrieve_frozen_graph.py:3-16,
utilize_frozen_graph.py): an artifact is a directory with
  artifact.json   — model class name, config, framework versions
  params.msgpack  — flax-serialized variables
Loadable without the training code path; `load_artifact` rebuilds the
model from the registered zoo and returns a ready apply function.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import serialization

_MODEL_REGISTRY: dict[str, Callable[[dict], Any]] = {}


def register_model(name: str):
    """Decorator: register a `(config_dict) -> flax module` factory."""

    def deco(factory):
        _MODEL_REGISTRY[name] = factory
        return factory

    return deco


@dataclasses.dataclass
class Artifact:
    model_name: str
    config: dict
    variables: Any

    def apply_fn(self) -> Callable:
        model = _MODEL_REGISTRY[self.model_name](self.config)
        variables = self.variables

        def apply(x):
            return model.apply(variables, jnp.asarray(x), train=False)

        return apply


def _json_safe(value: Any) -> Any:
    """Make config values JSON-round-trippable (dtypes become names)."""
    if isinstance(value, dict):
        return {k: _json_safe(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_json_safe(v) for v in value]
    try:
        return jnp.dtype(value).name if not isinstance(value, (int, float, str, bool, type(None))) else value
    except TypeError:
        return str(value)


def save_artifact(path: str, model_name: str, config: dict, variables: Any) -> None:
    os.makedirs(path, exist_ok=True)
    meta = {
        "model_name": model_name,
        "config": _json_safe(config),
        "format": "emx-artifact-v1",
        "jax_version": jax.__version__,
    }
    with open(os.path.join(path, "artifact.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    variables = jax.tree_util.tree_map(lambda x: jax.device_get(x), variables)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_artifact(path: str, template_variables: Any | None = None) -> Artifact:
    with open(os.path.join(path, "artifact.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        blob = f.read()
    if template_variables is not None:
        variables = serialization.from_bytes(template_variables, blob)
    else:
        variables = serialization.msgpack_restore(blob)
    return Artifact(meta["model_name"], meta["config"], variables)


def export_compiled(path: str, fn: Callable, example_args: tuple) -> None:
    """Serialize a jitted function to portable StableHLO bytes — the true
    "frozen graph" (reference tf_utility/freeze_graph.py:10-59): callers
    can execute it without any model code."""
    import jax.export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "module.stablehlo"), "wb") as f:
        f.write(exported.serialize())


def load_compiled(path: str) -> Callable:
    """Load a StableHLO artifact and return a callable (reference
    retrieve_frozen_graph.py:3-16 / utilize_frozen_graph.py)."""
    import jax.export as jexport

    with open(os.path.join(path, "module.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda *args: exported.call(*args)


# Register the zoo.
@register_model("denoiser")
def _make_denoiser(config: dict):
    from emx.nn.denoiser import Denoiser, DenoiserConfig

    fixed = {}
    for k, v in config.items():
        if k == "dtype":
            v = jnp.dtype(v)
        elif isinstance(v, list):
            v = tuple(v)
        fixed[k] = v
    return Denoiser(DenoiserConfig(**fixed))
