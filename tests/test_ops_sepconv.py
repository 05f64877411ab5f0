"""Fused separable-conv Pallas kernel vs the unfused lax twin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.ops.sepconv_kernel import fused_sepconv, sepconv_reference


@pytest.mark.parametrize("c,co,h", [(16, 32, 32), (8, 8, 64)])
def test_fused_sepconv_matches_reference(c, co, h):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, h, h, c)), jnp.float32)
    dw = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, c)), jnp.float32)
    dwb = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
    pw = jnp.asarray(rng.normal(0, 0.3, (1, 1, c, co)), jnp.float32)
    pwb = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    ref = sepconv_reference(x, dw, dwb, pw, pwb)
    got = fused_sepconv(x, dw, dwb, pw, pwb, rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_sepconv_bf16_edge_rows():
    """Edge tiles zero-pad rows correctly (top/bottom halos)."""
    rng = np.random.default_rng(1)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, c)), jnp.bfloat16)
    dw = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, c)), jnp.float32)
    dwb = jnp.zeros((c,), jnp.float32)
    pw = jnp.asarray(rng.normal(0, 0.3, (1, 1, c, c)), jnp.float32)
    pwb = jnp.zeros((c,), jnp.float32)
    ref = sepconv_reference(x.astype(jnp.float32), dw, dwb, pw, pwb)
    got = fused_sepconv(x, dw, dwb, pw, pwb, rows=8, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=0.03, atol=0.05)


def test_fused_quantized_apply_matches_quantized():
    """The SepConvBlock-level fusion must claim exactly the qualifying
    blocks and stay numerically close to the plain quantized graph
    (its pointwise runs bf16 instead of int8, so 'close', not equal)."""
    import dataclasses

    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.fused import fused_quantized_apply
    from emx.serve.quantize import calibrate, quantized_apply

    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=2, folded_head=16)
    model = Denoiser(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64)),
                    jnp.float32)
    variables = model.init(jax.random.key(1), x, train=False)
    amax = calibrate(model, variables, [x])
    base = np.asarray(quantized_apply(model, variables, amax, "mxu")(x))
    # min_pixels=0: every stride-1 rate-1 sepconv fuses (tiny graph).
    fused = np.asarray(fused_quantized_apply(
        model, variables, amax, "mxu", min_pixels=0, rows=8,
        interpret=True)(x))
    assert fused.shape == base.shape
    err = float(np.mean((fused - base) ** 2))
    ref = np.asarray(model.apply(variables, x, train=False))
    base_err = float(np.mean((base - ref) ** 2))
    assert err < max(10 * base_err, 1e-3), (err, base_err)


def test_dense_fold_matches_model():
    """dense_quantized_apply's folded dw->pw dense conv is exact: with
    an empty amax (every conv passes through float) the dense-folded
    graph must match the plain model apply to f32 tolerance."""
    import dataclasses

    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.fused import dense_quantized_apply

    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=4, folded_head=8)
    model = Denoiser(cfg)
    x = jnp.asarray(np.random.default_rng(3).random((1, 64, 64)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(dense_quantized_apply(
        model, variables, amax={}, min_pixels=1, quantized=False)(x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_dense_fold_int8_close_to_quantized():
    """The int8 dense-folded graph stays within quantization noise of
    the plain int8 graph (different grids: folded kernel vs two-stage)."""
    import dataclasses

    from emx.nn import Denoiser, DenoiserConfig
    from emx.serve.fused import dense_quantized_apply
    from emx.serve.quantize import calibrate, quantized_apply

    cfg = dataclasses.replace(DenoiserConfig.tiny(), norm="none",
                              space_to_depth=4, folded_head=8)
    model = Denoiser(cfg)
    x = jnp.asarray(np.random.default_rng(4).random((1, 64, 64)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    amax = calibrate(model, variables, [x])
    plain = np.asarray(jax.jit(
        quantized_apply(model, variables, amax, "mxu"))(x))
    dense = np.asarray(jax.jit(dense_quantized_apply(
        model, variables, amax, "mxu", min_pixels=1))(x))
    # Same float function, two int8 grids: agree to quantization noise.
    assert np.mean((plain - dense) ** 2) < 1e-3
