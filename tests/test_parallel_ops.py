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


def test_spatial_apply_non_divisible_height(spatial_mesh):
    # 250 rows over 8 shards with grid alignment: reflect-padded
    # internally, cropped back — identity must round-trip exactly.
    img = jnp.asarray(np.random.default_rng(4).random((250, 64)), jnp.float32)
    out = spatial_apply(lambda x: x, img, spatial_mesh, halo=4, grid=4)
    assert out.shape == img.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_spatial_apply_halo_rounded_to_grid(spatial_mesh):
    # halo=5 with grid=8 must behave like halo=8 (alignment), not crash.
    img = jnp.asarray(np.random.default_rng(5).random((256, 64)), jnp.float32)
    out = spatial_apply(lambda x: x, img, spatial_mesh, halo=5, grid=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_spatial_apply_rejects_oversized_halo(spatial_mesh):
    img = jnp.zeros((64, 16), jnp.float32)
    with pytest.raises(ValueError):
        spatial_apply(lambda x: x, img, spatial_mesh, halo=8)  # shard h = 8


def test_halo_denoise_matches_tiled_applier(spatial_mesh):
    """The multi-chip serving story (VERDICT r1 item 10): one big
    micrograph denoised halo-parallel over 8 shards must agree with the
    host-facing TiledApplier and with the single-pass full-image forward.
    The model's theoretical RF exceeds any practical halo, so agreement
    is within tolerance (both halo and tiling approximate full context
    the same way)."""
    from emx.nn import Denoiser, DenoiserConfig
    from emx.parallel.halo import halo_denoise
    from emx.serve.tiling import TiledApplier

    cfg = DenoiserConfig(features=(8, 8, 8, 8, 8), num_middle_blocks=0,
                         aspp_filters=8, aspp_out=8, norm="group",
                         space_to_depth=2)
    model = Denoiser(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64)))
    # 1024x512: big enough for 8 x 128-row shards with an 80->96 halo.
    img = jnp.asarray(
        np.random.default_rng(6).random((1024, 512)), jnp.float32)

    out_halo = np.asarray(halo_denoise(model, variables, img, spatial_mesh))
    assert out_halo.shape == img.shape

    full = np.asarray(model.apply(variables, img[None], train=False)[0])

    tiled = TiledApplier(model, variables, tile=256, overlap=64,
                         preprocess=False)
    out_tiled = np.asarray(tiled(img))

    err_halo = float(np.abs(out_halo - full).mean())
    err_tiled = float(np.abs(out_tiled - full).mean())
    # Halo-parallel must approximate the full pass at least as well as
    # the reference's own serving mechanism (x2 slack for edge effects).
    assert err_halo <= max(2 * err_tiled, 5e-3), (err_halo, err_tiled)
