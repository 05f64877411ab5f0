"""Extra model-zoo tests: autoencoders, embedder, kernel bank, latent AE,
VAE-GAN, shared manifold, style transfer, profile MLP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emx.data.pipeline import synthetic_micrographs


def test_small_autoencoder_shapes():
    from emx.nn import SmallAEConfig, SmallAutoencoder

    model = SmallAutoencoder(SmallAEConfig(features=(8, 8, 8), bottleneck=4,
                                           norm="group"))
    x = jnp.zeros((2, 32, 32))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 32, 32)


def test_xception_autoencoder_shapes():
    from emx.nn import XceptionAEConfig, XceptionAutoencoder

    model = XceptionAutoencoder(XceptionAEConfig.tiny())
    x = jnp.zeros((1, 64, 64))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 64)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_embedder_and_metric_loss():
    from emx.nn import EmbedderConfig, UnsupervisedEmbedder, embedder_metric_loss

    model = UnsupervisedEmbedder(EmbedderConfig.tiny())
    x = jnp.asarray(synthetic_micrographs(4, 32, seed=0))
    variables = model.init(jax.random.key(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (4, 6)
    np.testing.assert_allclose(np.asarray(emb.sum(-1)), 1.0, atol=1e-5)
    loss = embedder_metric_loss(emb)
    assert np.isfinite(float(loss))


def test_symmetric_kernel_tying():
    from emx.nn.kernels import SymmetricKernel, num_unique, symmetry_index_map

    m = symmetry_index_map(5)
    assert m.max() + 1 == num_unique(5) == 6
    # D4 symmetry of the index map.
    np.testing.assert_array_equal(m, m.T)
    np.testing.assert_array_equal(m, m[::-1])
    np.testing.assert_array_equal(m, m[:, ::-1])

    layer = SymmetricKernel(size=5)
    variables = layer.init(jax.random.key(0), jnp.zeros((1, 16, 16)))
    assert variables["params"]["unique"].shape == (6,)
    out = layer.apply(variables, jnp.ones((1, 16, 16)))
    # Init = box filter 1/25 each + bias 0 -> interior output 1.
    assert float(out[0, 8, 8]) == pytest.approx(1.0, rel=1e-4)


def test_kernel_bank_trains_all_variants():
    from emx.nn.kernels import KernelBank

    bank = KernelBank(depths=(1, 2), widths=(3, 5), learning_rate=0.02)
    # Identity task: the box-filter init blurs, so training must sharpen
    # every variant toward the delta kernel and reduce its loss.
    clean = jnp.asarray(synthetic_micrographs(4, 32, seed=1))
    state = bank.init(jax.random.key(1), clean[:1])
    step = bank.make_step()
    state, l0 = step(state, clean, clean)
    for _ in range(40):
        state, losses = step(state, clean, clean)
    assert losses.shape == (4,)
    assert (np.asarray(losses) < np.asarray(l0)).all()
    assert bank.labels() == ["depth1_width3", "depth1_width5",
                             "depth2_width3", "depth2_width5"]


def test_latent_autoencoder_roundtrip_shapes():
    from emx.nn.latent import LatentAEConfig, LatentAutoencoder

    cfg = LatentAEConfig.tiny()
    model = LatentAutoencoder(cfg)
    x = jnp.zeros((2, 32, 32))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 32, 32)  # 4 * 2^3 = 32
    z = model.apply(variables, x, train=False, method=LatentAutoencoder.encode)
    assert z.shape == (2, cfg.latent_dim)
    assert float(jnp.abs(z).max()) <= 1.0


def test_vaegan_losses_finite():
    from emx.nn.vaegan import (
        NestedVAEGAN,
        SpectralCritic,
        VAEGANConfig,
        vaegan_losses,
    )

    cfg = VAEGANConfig.tiny()
    model = NestedVAEGAN(cfg)
    critic = SpectralCritic(cfg)
    batch = jnp.asarray(synthetic_micrographs(2, 32, seed=2))
    k = jax.random.key(0)
    variables = model.init(k, batch, k, train=False)
    critic_vars = critic.init(jax.random.key(1), batch)
    total, parts = vaegan_losses(model, variables, critic, critic_vars,
                                 batch, jax.random.key(2))
    assert np.isfinite(float(total))
    for name, v in parts.items():
        assert np.isfinite(float(v)), name
    assert float(parts["gp"]) >= 0.0


def test_polar_warp_and_cutout():
    from emx.nn.vaegan import cutout, polar_warp

    img = jnp.asarray(synthetic_micrographs(1, 32, seed=3)[0])
    pol = polar_warp(img)
    assert pol.shape == img.shape
    cut = cutout(jax.random.key(0), img, 0.25)
    assert float(jnp.mean(cut != img)) > 0.02


def test_shared_manifold_translator():
    from emx.nn.manifold import (
        ManifoldConfig,
        SharedManifoldTranslator,
        manifold_losses,
    )

    model = SharedManifoldTranslator(ManifoldConfig.tiny())
    a = jnp.asarray(synthetic_micrographs(2, 32, seed=4))
    b = jnp.asarray(synthetic_micrographs(2, 32, seed=5))
    variables = model.init(jax.random.key(0), a, b)
    out = model.apply(variables, a, b)
    assert out["a_to_b"].shape == a.shape
    assert out["b_to_a"].shape == b.shape
    losses = manifold_losses(out, a, b)
    for v in losses.values():
        assert np.isfinite(float(v))


def test_style_transfer_moves_toward_style():
    from emx.analysis.stats import gram_matrix
    from emx.nn.style import STYLE_LAYERS, StyleTransferConfig, make_feature_fn, transfer_style

    content = jnp.asarray(synthetic_micrographs(1, 32, seed=6)[0])
    style = jnp.asarray(synthetic_micrographs(1, 32, seed=7)[0])
    feature_fn = make_feature_fn(32, seed=0)
    cfg = StyleTransferConfig(steps=40, learning_rate=0.05, input_noise=0.0)
    out = transfer_style(content, style, cfg, feature_fn=feature_fn)
    assert out.shape == content.shape

    def style_dist(img):
        f = feature_fn(img)
        fs = feature_fn(style)
        return sum(
            float(jnp.mean((gram_matrix(f[l][0]) - gram_matrix(fs[l][0])) ** 2))
            for l in STYLE_LAYERS
        )

    assert style_dist(out) < style_dist(content)


def test_profile_mlp_and_equalizer():
    from emx.nn.profiles import FeatureEqualizer, ProfileMLP, ProfileMLPConfig, stats_to_feature_vector
    from emx.physics import image_stats

    imgs = jnp.asarray(synthetic_micrographs(6, 32, seed=8))
    stats = jax.vmap(image_stats)(imgs)
    from emx.physics.stats import STAT_NAMES

    feats = stats_to_feature_vector(stats)
    assert feats.shape == (6, len(STAT_NAMES))

    eq = FeatureEqualizer(np.asarray(feats))
    eqf = eq(np.asarray(feats))
    assert eqf.shape == feats.shape
    assert eqf.min() >= 0.0 and eqf.max() <= 1.0

    mlp = ProfileMLP(ProfileMLPConfig(hidden=(16,), out_dim=1))
    variables = mlp.init(jax.random.key(0), jnp.asarray(eqf))
    out = mlp.apply(variables, jnp.asarray(eqf))
    assert out.shape == (6, 1)


def test_fractal_recursive_conv_weight_sharing():
    from emx.nn.fractal import FractalConfig, RecursiveFractalConv

    model = RecursiveFractalConv(FractalConfig(features=8, turns=3,
                                               norm="group"))
    x = jnp.zeros((2, 16, 16))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 16, 16)
    # Recursion uses ONE weight set regardless of turns: the param tree
    # has exactly one `recur` entry.
    assert "recur" in variables["params"]
    n_recur = sum(1 for k in variables["params"] if k.startswith("recur"))
    assert n_recur == 1
