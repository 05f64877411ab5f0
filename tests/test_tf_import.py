"""TF1 checkpoint mapping: the generated name table must cover the flax
tree exactly, and export -> import must reproduce the model FUNCTION
(BN affines are re-expressed, so equality is on outputs)."""

import jax
import jax.numpy as jnp
import numpy as np

from emx.nn import Denoiser
from emx.serve.tf_import import (
    denoiser_tf1_mapping,
    export_tf1_vars,
    import_tf1_checkpoint,
    tf_compat_config,
)

CFG = tf_compat_config(features=(8, 8, 8, 8, 8), num_middle_blocks=1,
                       aspp_out=8)


def _randomized_variables(model, x):
    """Init then randomise every leaf except separable-conv biases
    (absent in the TF graph, so the mapping constrains them to zero)."""
    variables = model.init(jax.random.key(0), x, train=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    rng = np.random.default_rng(5)
    out = []
    for path, leaf in flat:
        keys = [getattr(p, "key", "") for p in path]
        is_sep_bias = ("bias" in keys and any(
            k.startswith("SepConvBlock") for k in keys))
        if is_sep_bias:
            out.append(jnp.zeros_like(leaf))
        elif keys[-1] == "var":
            out.append(jnp.asarray(
                rng.uniform(0.5, 2.0, leaf.shape), leaf.dtype))
        else:
            out.append(jnp.asarray(
                rng.normal(0, 0.5, leaf.shape), leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def test_mapping_names_are_unique_and_tf1_shaped():
    recs = denoiser_tf1_mapping(CFG)
    tf_names = [r["tf"] for r in recs] + [r["tf_outer_bn"]
                                          for r in recs if "tf_outer_bn" in r]
    assert len(tf_names) == len(set(tf_names))
    assert all(n.startswith("nn/") for n in tf_names)
    # The reference graph: 12 encoder seps + 3 block-4 + 3*middle +
    # 6 decoder seps = 24+3N separable convs.
    n_sep = sum(1 for r in recs if r["kind"] == "sep")
    assert n_sep == 21 + 3 * CFG.num_middle_blocks


def test_roundtrip_reproduces_function_and_tree():
    model = Denoiser(CFG)
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64)),
                    jnp.float32)
    variables = _randomized_variables(model, x)
    expect = model.apply(variables, x, train=False)

    tf_vars = export_tf1_vars(variables, CFG)
    imported = import_tf1_checkpoint(tf_vars, CFG)
    # Completeness: identical tree structure (params + stats).
    assert jax.tree_util.tree_structure(imported["params"]) == \
        jax.tree_util.tree_structure(variables["params"])
    assert jax.tree_util.tree_structure(imported["batch_stats"]) == \
        jax.tree_util.tree_structure(variables["batch_stats"])
    got = model.apply(imported, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5)
