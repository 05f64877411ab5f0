"""Spatial halo parallelism + Pallas kernel tests (8-device CPU mesh;
Pallas runs in interpret mode off-TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.parallel import make_mesh
from emx.parallel.halo import exchange_halo, spatial_apply, spatial_sharded_image


@pytest.fixture(scope="module")
def spatial_mesh():
    return make_mesh(data=1, spatial=8)


def test_spatial_apply_identity(spatial_mesh):
    img = jnp.asarray(np.random.default_rng(0).random((256, 64)), jnp.float32)
    out = spatial_apply(lambda x: x, img, spatial_mesh, halo=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_spatial_apply_matches_global_conv(spatial_mesh):
    # A conv with receptive radius 2 must be exact with halo >= 2 in the
    # interior (edge shards use reflect, global conv uses zeros -> compare
    # away from the outer boundary only).
    kernel = jnp.asarray(np.random.default_rng(1).random((5, 5)), jnp.float32)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x[None, None], kernel[None, None], (1, 1), padding="SAME"
        )[0, 0]

    img = jnp.asarray(np.random.default_rng(2).random((256, 64)), jnp.float32)
    expect = conv(img)
    sharded = spatial_sharded_image(img, spatial_mesh)
    out = spatial_apply(conv, sharded, spatial_mesh, halo=4)
    np.testing.assert_allclose(
        np.asarray(out)[4:-4], np.asarray(expect)[4:-4], atol=1e-4
    )


def test_spatial_apply_with_denoiser_tiny(spatial_mesh):
    # End-to-end: a conv model over one sharded "big" micrograph.
    from emx.nn import Denoiser, DenoiserConfig

    model = Denoiser(DenoiserConfig(features=(8, 8, 8, 8, 8),
                                    num_middle_blocks=0, aspp_filters=8,
                                    aspp_out=8, norm="group"))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32)))

    def apply_fn(x2d):
        return model.apply(variables, x2d[None], train=False)[0]

    img = jnp.asarray(np.random.default_rng(3).random((256, 64)), jnp.float32)
    out = spatial_apply(apply_fn, img, spatial_mesh, halo=16)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_fused_degrade_statistics():
    from emx.ops.degrade_kernel import fused_poisson_degrade

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((4, 64, 64)), jnp.float32)
    scales = jnp.asarray([30.0, 80.0, 150.0, 400.0])
    out = fused_poisson_degrade(jnp.int32(7), imgs, scales)
    assert out.shape == imgs.shape
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0
    # Noise decreases with dose: residual vs normalized clean image.
    resids = []
    for i in range(4):
        clean = np.asarray(imgs[i])
        clean01 = (clean - clean.min()) / (clean.max() - clean.min())
        resids.append(np.std(o[i] - clean01))
    assert resids[-1] < resids[0]


def test_fused_degrade_poisson_mean_variance():
    # For a constant image the normalized output stays near the clean
    # value with std ~ 1/sqrt(rate) scaled by the normalization span.
    from emx.ops.degrade_kernel import fused_poisson_degrade

    imgs = jnp.full((1, 128, 128), 0.5, jnp.float32)
    out = fused_poisson_degrade(jnp.int32(3), imgs,
                                jnp.asarray([200.0]))
    o = np.asarray(out[0])
    # Counts ~ Poisson(100): relative std 10%; after min-max normalization
    # the mean sits mid-range.
    assert 0.3 < o.mean() < 0.7


def test_fused_degrade_deterministic_per_seed():
    from emx.ops.degrade_kernel import fused_poisson_degrade

    imgs = jnp.asarray(np.random.default_rng(1).random((2, 32, 32)), jnp.float32)
    scales = jnp.asarray([50.0, 50.0])
    a = fused_poisson_degrade(jnp.int32(5), imgs, scales)
    b = fused_poisson_degrade(jnp.int32(5), imgs, scales)
    c = fused_poisson_degrade(jnp.int32(6), imgs, scales)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    # Different images in the batch get different noise.
    assert not np.array_equal(np.asarray(a[0]), np.asarray(a[1]))
