"""Deployment artifacts: one-file serialized (config, params) bundles.

The reference's deployment unit is a frozen graph — weights baked into
the served graphdef (tf_utility/freeze_graph.py:10-59). The TPU-native
equivalent is a (DenoiserConfig, params) bundle: the config rebuilds the
exact jitted program and the params are the folded (norm-free) weights,
so the benched graph, the served graph, and the artifact are all the
same program. Stored as one .npz: flattened param paths -> arrays plus
a JSON-encoded config entry.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_CFG_KEY = "__config_json__"
_QUANT_KEY = "__quant_json__"
_SEP = "/"


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_denoiser_artifact(path: str, config, variables: dict,
                           quant: dict | None = None) -> None:
    """Save a Denoiser deployment bundle. `variables` must be inference
    variables ({'params': ...}); fold BatchNorm first
    (emx.serve.optimize.fold_denoiser).

    `quant` optionally promotes a post-training-quantized serving mode
    into the bundle: {"mode": "store"|"mxu", "amax": {conv_path: float},
    ...evidence}. Only written after emx.bench.quant_check has verified
    the mode's val-ladder PSNR clears the classical-filter bar — a
    loader that honors it (bench.py) then serves the int8 graph."""
    if "batch_stats" in variables and jax.tree_util.tree_leaves(
            variables["batch_stats"]):
        raise ValueError("artifact must be a folded (norm-free) model; "
                         "run emx.serve.optimize.fold_denoiser first")
    flat = _flatten(jax.tree_util.tree_map(np.asarray,
                                           variables["params"]))
    cfg_json = json.dumps({
        f.name: getattr(config, f.name)
        if not f.name == "dtype" else str(np.dtype(getattr(config, f.name)))
        for f in dataclasses.fields(config)
    }, default=list)
    extra = {_CFG_KEY: np.frombuffer(cfg_json.encode(), dtype=np.uint8)}
    if quant is not None:
        assert quant.get("mode") in ("store", "mxu", "mxu2") \
            and "amax" in quant
        # amax values may be per-input-channel arrays; JSON them as lists.
        extra[_QUANT_KEY] = np.frombuffer(
            json.dumps(quant, default=lambda a: np.asarray(a).tolist())
            .encode(), dtype=np.uint8)
    np.savez(path, **flat, **extra)


def _kp_str(k) -> str:
    # jax key-path entries: DictKey(.key) / GetAttrKey(.name) / SequenceKey(.idx)
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "name"):
        return str(k.name)
    return str(getattr(k, "idx", k))


def save_pytree_npz(path: str, tree, meta: dict | None = None) -> None:
    """Persist an arbitrary pytree (params, batch_stats, ...) as one .npz
    keyed by tree paths. Unlike the orbax checkpoints (gitignored, lost
    between build sessions), these bundles are small enough to commit, so
    a later session can warm-start training instead of redoing it.
    `meta` (JSON-serializable) rides along under a reserved key."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if a.dtype == jnp.bfloat16:
            # npz stores ml_dtypes bfloat16 as raw void bytes and loses
            # the dtype on load; widen here (the loader re-narrows to the
            # reference tree's dtype).
            a = a.astype(np.float32)
        flat[_SEP.join(_kp_str(k) for k in kp)] = a
    extra = {"__meta_json__": np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)}
    np.savez(path, **flat, **extra)


def load_pytree_like(path: str, ref_tree):
    """Load a save_pytree_npz bundle INTO the structure of `ref_tree`:
    containers (dict vs FrozenDict) and leaf dtypes follow the reference,
    values come from the file — so the result drops into an existing
    TrainState without changing optimizer treedefs. Returns (tree, meta).
    Raises KeyError if the reference has a path the file lacks."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta_json__"]).decode()) \
            if "__meta_json__" in z.files else {}
        flat = {k: z[k] for k in z.files if k != "__meta_json__"}

    def pick(kp, ref):
        v = flat[_SEP.join(_kp_str(k) for k in kp)]
        return jnp.asarray(v, dtype=ref.dtype) if hasattr(ref, "dtype") \
            else type(ref)(v)

    tree = jax.tree_util.tree_map_with_path(pick, ref_tree)
    return tree, meta


def load_denoiser_artifact(path: str, with_quant: bool = False):
    """Load a bundle; returns (DenoiserConfig, {'params': ...}), plus the
    quant dict (or None) as a third element when `with_quant`."""
    from emx.nn import DenoiserConfig

    with np.load(path) as z:
        cfg_d: dict[str, Any] = json.loads(bytes(z[_CFG_KEY]).decode())
        quant = (json.loads(bytes(z[_QUANT_KEY]).decode())
                 if _QUANT_KEY in z.files else None)
        if quant is not None:
            quant["amax"] = {
                k: (np.asarray(v, dtype=np.float32)
                    if isinstance(v, list) else v)
                for k, v in quant["amax"].items()}
        flat = {k: z[k] for k in z.files
                if k not in (_CFG_KEY, _QUANT_KEY)}
    # JSON round-trips tuples as lists; restore every tuple-typed field
    # (matched by the dataclass default's type, so new fields keep working).
    for f in dataclasses.fields(DenoiserConfig):
        if (f.name in cfg_d and isinstance(cfg_d[f.name], list)
                and isinstance(getattr(DenoiserConfig(), f.name), tuple)):
            cfg_d[f.name] = tuple(cfg_d[f.name])
    # np.dtype resolves 'bfloat16' through jax's ml_dtypes registration.
    cfg_d["dtype"] = np.dtype(cfg_d["dtype"]).type
    # remat is a training-memory knob; a serving graph must not carry it
    # (and flax remat breaks the quantization calibration interceptor).
    # Param paths are identical either way (emx/nn/denoiser.py:248).
    cfg_d["remat_middle"] = False
    config = DenoiserConfig(**cfg_d)
    variables = {"params": _unflatten(flat)}
    if with_quant:
        return config, variables, quant
    return config, variables
