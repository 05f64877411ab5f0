"""Model-zoo quality ladder (VERDICT r2 item 5): short trained-quality
runs with a task metric for one representative of each model family
beyond the denoiser/GAN, converting "compiles and loss decreases" into
"works".

Families and metrics (each scored against a principled anchor):
  * small_ae     — SmallAutoencoder (reference autoencoder.py:83-176):
                   val reconstruction PSNR vs the best-constant
                   (per-image mean) predictor.
  * xception_ae  — XceptionAutoencoder (modified_Xception.py:649-653):
                   val reconstruction PSNR vs the same anchor.
  * latent_ae    — LatentAutoencoder (usupervised_latency.py:205-455):
                   val reconstruction PSNR vs the same anchor.
  * embedder     — UnsupervisedEmbedder (unsupervised_Xception.py:435-
                   457,677-727): top-1 nearest-neighbour retrieval of
                   the augmented-pair partner vs chance.
  * kernels      — KernelBank (noise-removal-kernels.py:434-449):
                   best-kernel denoise PSNR vs the Gaussian filter.

Usage: python -m emx.bench.zoo_ladder [out_dir] [steps] [scale]
Writes <out_dir>/quality.json; prints one JSON line per family + summary.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _data(n, size, seed):
    from emx.data.pipeline import synthetic_micrographs

    return jnp.asarray(synthetic_micrographs(n, size, seed=seed))


def _psnr_mean(pred, truth):
    from emx.utils.image import psnr

    return float(jnp.mean(jax.vmap(psnr)(pred, truth)))


def _const_anchor(val):
    """PSNR of the best constant (per-image mean) predictor."""
    mean = jnp.mean(val, axis=(-2, -1), keepdims=True)
    return _psnr_mean(jnp.broadcast_to(mean, val.shape), val)


def _train_recon(model, train_imgs, val_imgs, steps, batch, lr=1e-3,
                 seed=0):
    """Plain reconstruction training: model(x) -> x, Adam, jitted step."""
    variables = model.init(jax.random.key(seed), train_imgs[:batch],
                           train=False)
    params = variables["params"]
    has_stats = bool(jax.tree_util.tree_leaves(
        variables.get("batch_stats", {})))
    stats = variables.get("batch_stats", {})
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state, key, imgs):
        def loss_fn(p):
            v = {"params": p}
            rngs = {"dropout": key}
            if has_stats:
                v["batch_stats"] = stats
                out, upd = model.apply(v, imgs, train=True, rngs=rngs,
                                       mutable=["batch_stats"])
                return jnp.mean((out - imgs) ** 2), upd["batch_stats"]
            out = model.apply(v, imgs, train=True, rngs=rngs)
            return jnp.mean((out - imgs) ** 2), stats

        (loss, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), new_stats, \
            opt_state, loss

    n = train_imgs.shape[0]
    key = jax.random.key(seed + 1)
    loss = None
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (batch,), 0, n)
        params, stats, opt_state, loss = step(
            params, stats, opt_state, k, jnp.take(train_imgs, idx, axis=0))
    v = {"params": params}
    if has_stats:
        v["batch_stats"] = stats
    out = jax.jit(lambda x: model.apply(v, x, train=False))(val_imgs)
    return _psnr_mean(out, val_imgs), float(loss)


def run_small_ae(steps, scale, size, seed=0):
    from emx.nn import SmallAEConfig, SmallAutoencoder

    cfg = SmallAEConfig() if scale >= 1 else SmallAEConfig(
        features=(16, 24, 32), bottleneck=16)
    model = SmallAutoencoder(cfg)
    train, val = _data(256, size, 1), _data(16, size, 99)
    psnr, loss = _train_recon(model, train, val, steps, batch=16)
    return {"psnr": round(psnr, 2),
            "anchor_const_psnr": round(_const_anchor(val), 2),
            "final_loss": round(loss, 5)}


def run_xception_ae(steps, scale, size, seed=0):
    from emx.nn import XceptionAEConfig, XceptionAutoencoder

    cfg = XceptionAEConfig(
        entry_features=tuple(max(8, int(f * scale))
                             for f in (128, 256, 728)),
        num_middle_blocks=max(1, int(16 * scale)),
        exit_features=tuple(max(8, int(f * scale)) for f in (728, 1024)),
        aspp_out=max(8, int(256 * scale)),
        decoder_features=tuple(max(8, int(f * scale))
                               for f in (256, 128, 64, 32)),
        dtype=jnp.bfloat16,
    )
    model = XceptionAutoencoder(cfg)
    train, val = _data(256, size, 2), _data(16, size, 98)
    psnr, loss = _train_recon(model, train, val, steps, batch=8)
    return {"psnr": round(psnr, 2),
            "anchor_const_psnr": round(_const_anchor(val), 2),
            "final_loss": round(loss, 5)}


def run_latent_ae(steps, scale, size, seed=0):
    from emx.nn import LatentAEConfig, LatentAutoencoder

    # Decoder emits 4 * 2^len(dec_features): pick a pow2 working size.
    size = 128
    n_dec = int(np.log2(size // 4))
    full = LatentAEConfig()
    cfg = dataclasses.replace(
        full,
        enc_features=tuple(max(8, int(f * scale))
                           for f in full.enc_features[:n_dec]),
        head_features=tuple(max(8, int(f * scale))
                            for f in full.head_features),
        dec_features=tuple(max(8, int(f * scale))
                           for f in full.dec_features[-n_dec:]),
        latent_dim=max(16, int(full.latent_dim * scale)),
    )
    model = LatentAutoencoder(cfg)
    train, val = _data(256, size, 3), _data(16, size, 97)
    psnr, loss = _train_recon(model, train, val, steps, batch=8)
    return {"psnr": round(psnr, 2),
            "anchor_const_psnr": round(_const_anchor(val), 2),
            "final_loss": round(loss, 5)}


def run_embedder(steps, scale, size, seed=0):
    from emx.nn import EmbedderConfig, UnsupervisedEmbedder
    from emx.nn.autoencoder import embedder_metric_loss
    from emx.utils.image import flip_rotate

    cfg = EmbedderConfig(
        entry_features=tuple(max(8, int(f * scale))
                             for f in (128, 256, 728)),
        num_middle_blocks=max(1, int(8 * scale)),
        fc_features=max(32, int(4096 * scale)),
        embedding_dim=30, dtype=jnp.bfloat16,
    )
    model = UnsupervisedEmbedder(cfg)
    # Pairs are two random CROPS of the same parent micrograph (+ flip):
    # the reference's pairs come from its crop dataset of parent stills
    # (unsupervised_Xception.py input_fn), and shared texture between
    # crops is the learnable invariance. (D4 transforms of the identical
    # frame made the task orientation-invariance, which the metric loss
    # collapsed on.)
    crop = size * 2 // 3
    # 512 parents: at 128 the metric memorizes the pool (8k steps hit
    # train loss 0.26 with held-out retrieval 0.0 — classic overfit).
    imgs = _data(512, size, 4)

    def make_pairs(key, batch_imgs):
        """(2b, c, c): consecutive pairs are crops of one image."""
        ks = jax.random.split(key, batch_imgs.shape[0])
        hi = size - crop

        def one_crop(k, img):
            oy = jax.random.randint(jax.random.fold_in(k, 0), (), 0, hi)
            ox = jax.random.randint(jax.random.fold_in(k, 1), (), 0, hi)
            c = jax.lax.dynamic_slice(img, (oy, ox), (crop, crop))
            return flip_rotate(c, jax.random.randint(
                jax.random.fold_in(k, 2), (), 0, 4))

        def two(k, img):
            return jnp.stack([one_crop(jax.random.fold_in(k, 10), img),
                              one_crop(jax.random.fold_in(k, 11), img)])

        return jax.vmap(two)(ks, batch_imgs).reshape(-1, crop, crop)

    variables = model.init(jax.random.key(seed),
                           jnp.zeros((2, crop, crop)), train=False)
    params = variables["params"]
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key, batch_imgs):
        pairs = make_pairs(key, batch_imgs)

        def loss_fn(p):
            # Metric loss on the penultimate features: the reference
            # applies its cosine losses to the raw network output
            # (unsupervised_Xception.py:700-712), not the softmax
            # simplex — and on the simplex the loss has a stable
            # collapse (everything -> uniform, loss pinned at 1.0,
            # observed at 2.5k steps).
            e = model.apply({"params": p}, pairs, train=True,
                            features=True)
            return embedder_metric_loss(e)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(seed + 1)
    b = 16
    loss = None
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (b,), 0, imgs.shape[0])
        params, opt_state, loss = step(params, opt_state, k,
                                       jnp.take(imgs, idx, axis=0))

    # Retrieval eval on held-out micrographs: nearest neighbour over the
    # penultimate FC features (the softmax head collapses rank), partner
    # = the other crop of the same parent.
    val = _data(32, size, 96)
    pairs = make_pairs(jax.random.key(7), val)
    e = jax.jit(lambda x: model.apply({"params": params}, x,
                                      train=False, features=True))(pairs)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)
    # np.array (copy): np.asarray of a jax array is a read-only view and
    # fill_diagonal mutates.
    sim = np.array(e @ e.T)
    np.fill_diagonal(sim, -np.inf)
    nn_idx = sim.argmax(axis=1)
    partner = np.arange(len(nn_idx)) ^ 1  # 2i <-> 2i+1
    acc = float((nn_idx == partner).mean())
    return {"top1_retrieval": round(acc, 3),
            "chance": round(1.0 / (len(nn_idx) - 1), 4),
            "crop": crop, "final_loss": round(float(loss), 5)}


def run_embedder_nce(steps, scale, size, seed=0):
    """Same encoder/pair task as run_embedder, trained with a symmetric
    InfoNCE (NT-Xent) objective over in-batch negatives instead of the
    reference's paired-cosine/median-margin loss — an emx-native
    upgrade: every off-pair in the batch is a negative with its own
    gradient (the reference loss only moves the MEDIAN off-pair
    similarity, so most negatives get no signal; measured 7.8% held-out
    retrieval at 16k steps). Reference task semantics unchanged
    (unsupervised_Xception.py input_fn crops)."""
    from emx.nn import EmbedderConfig, UnsupervisedEmbedder
    from emx.utils.image import flip_rotate

    cfg = EmbedderConfig(
        entry_features=tuple(max(8, int(f * scale))
                             for f in (128, 256, 728)),
        num_middle_blocks=max(1, int(8 * scale)),
        fc_features=max(32, int(4096 * scale)),
        embedding_dim=30, dtype=jnp.bfloat16,
    )
    model = UnsupervisedEmbedder(cfg)
    crop = size * 2 // 3
    imgs = _data(512, size, 4)
    hi = size - crop

    def make_pairs(key, batch_imgs):
        ks = jax.random.split(key, batch_imgs.shape[0])

        def one_crop(k, img):
            oy = jax.random.randint(jax.random.fold_in(k, 0), (), 0, hi)
            ox = jax.random.randint(jax.random.fold_in(k, 1), (), 0, hi)
            c = jax.lax.dynamic_slice(img, (oy, ox), (crop, crop))
            return flip_rotate(c, jax.random.randint(
                jax.random.fold_in(k, 2), (), 0, 4))

        def two(k, img):
            return jnp.stack([one_crop(jax.random.fold_in(k, 10), img),
                              one_crop(jax.random.fold_in(k, 11), img)])

        return jax.vmap(two)(ks, batch_imgs).reshape(-1, crop, crop)

    def info_nce(e, temp=0.1):
        e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True),
                            1e-8)
        logits = (e @ e.T) / temp
        n = e.shape[0]
        logits = jnp.where(jnp.eye(n, dtype=bool), -1e9, logits)
        partner = jnp.arange(n) ^ 1  # (2i, 2i+1) are a pair
        return jnp.mean(
            -jax.nn.log_softmax(logits, axis=-1)[jnp.arange(n), partner])

    variables = model.init(jax.random.key(seed),
                           jnp.zeros((2, crop, crop)), train=False)
    params = variables["params"]
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key, batch_imgs):
        pairs = make_pairs(key, batch_imgs)

        def loss_fn(p):
            e = model.apply({"params": p}, pairs, train=True,
                            features=True)
            return info_nce(e.astype(jnp.float32))

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(seed + 1)
    b = 32
    loss = None
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (b,), 0, imgs.shape[0])
        params, opt_state, loss = step(params, opt_state, k,
                                       jnp.take(imgs, idx, axis=0))

    val = _data(32, size, 96)
    pairs = make_pairs(jax.random.key(7), val)
    e = jax.jit(lambda x: model.apply({"params": params}, x,
                                      train=False, features=True))(pairs)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)
    sim = np.array(e @ e.T)
    np.fill_diagonal(sim, -np.inf)
    nn_idx = sim.argmax(axis=1)
    partner = np.arange(len(nn_idx)) ^ 1
    acc = float((nn_idx == partner).mean())
    return {"top1_retrieval": round(acc, 3),
            "chance": round(1.0 / (len(nn_idx) - 1), 4),
            "crop": crop, "final_loss": round(float(loss), 5)}


def run_kernels(steps, scale, size, seed=0):
    from emx.analysis.filters import gaussian_filter
    from emx.data.degrade import poisson_dose
    from emx.nn import KernelBank
    from emx.utils.image import psnr

    bank = KernelBank(depths=(1, 2, 3), widths=(3, 5, 7))
    train, val = _data(64, size, 5), _data(16, size, 95)

    @jax.jit
    def degrade(key, imgs):
        ks = jax.random.split(key, imgs.shape[0])
        doses = 25.0 + jax.random.exponential(
            jax.random.fold_in(key, 1), (imgs.shape[0],)) * 75.0
        lq = jax.vmap(poisson_dose)(ks, imgs, doses)
        tgt = imgs * (jnp.mean(lq, axis=(-2, -1), keepdims=True)
                      / jnp.maximum(jnp.mean(imgs, axis=(-2, -1),
                                             keepdims=True), 1e-12))
        return lq, tgt

    state = bank.init(jax.random.key(seed), train[:4])
    step = bank.make_step()
    key = jax.random.key(seed + 1)
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (8,), 0, train.shape[0])
        noisy, clean = degrade(k, jnp.take(train, idx, axis=0))
        state, losses = step(state, noisy, clean)

    noisy, clean = degrade(jax.random.key(9), val)
    scores = {}
    for (label, (d, w, m)), p in zip(
            zip(bank.labels(), bank.models), state["params"]):
        out = jax.jit(lambda x, m=m, p=p: m.apply(p, x))(noisy)
        scores[label] = round(float(jnp.mean(
            jax.vmap(psnr)(out, clean))), 2)
    gauss = jax.vmap(lambda x: gaussian_filter(x, 1.5))(noisy)
    anchor = round(float(jnp.mean(jax.vmap(psnr)(gauss, clean))), 2)
    best = max(scores.items(), key=lambda kv: kv[1])
    return {"best_kernel": best[0], "best_psnr": best[1],
            "anchor_gaussian_psnr": anchor, "all": scores}


def run_vaegan(steps, scale, size, seed=0, kl_weight=1.0,
               wass_weight=1.0, wass_anneal=False):
    """Nested VAE-GAN (reference misc_py/ga-vae.py:852-1050): WGAN-GP
    alternation of the spectral critic and the generator-side composite
    loss. Metrics: val reconstruction PSNR through the nested bottleneck
    vs the best-constant anchor, and siamese top-1 retrieval of a cutout
    view's clean partner vs chance.

    `kl_weight` < 1 relaxes the inner-VAE bottleneck (the reference
    weight 1.0 measured 12.2 dB recon at 16k steps — below the constant
    anchor, classic posterior squeeze; the kl=0.1 ablation measured
    WORSE — 10.3 dB — so the KL is not the recon bottleneck).

    `wass_weight` / `wass_anneal` attack the round-3 diagnosis that the
    Wasserstein realism term is what keeps recon below the constant
    anchor: anneal ramps the critic's weight linearly 0 -> wass_weight
    over training (pure autoencoding first, realism later), so the
    reconstruction objective establishes the mapping before the critic
    starts trading pixel fidelity for realism."""
    import optax

    from emx.nn.vaegan import (NestedVAEGAN, SpectralCritic, VAEGANConfig,
                               VAEGANLossWeights, cutout, vaegan_losses)

    cfg = VAEGANConfig(
        enc_features=tuple(max(8, int(f * scale))
                           for f in (64, 128, 256, 512)),
        inner_latent=max(8, int(64 * scale)),
        dec_features=tuple(max(8, int(f * scale))
                           for f in (256, 128, 64, 32)),
        critic_features=tuple(max(8, int(f * scale))
                              for f in (64, 128, 256, 512)),
        siamese_dim=max(8, int(64 * scale)))
    model = NestedVAEGAN(cfg)
    critic = SpectralCritic(cfg)
    train, val = _data(256, size, 3), _data(16, size, 97)
    batch = 8

    k0 = jax.random.key(seed)
    variables = model.init(k0, train[:batch], k0, train=False)
    critic_vars = critic.init(jax.random.key(seed + 1), train[:batch])
    g_opt, c_opt = optax.adam(1e-4, b1=0.5), optax.adam(1e-4, b1=0.5)
    g_state = g_opt.init(variables["params"])
    c_state = c_opt.init(critic_vars["params"])

    @jax.jit
    def step(params, g_state, c_params, c_spec, c_state, key, imgs, w):
        k_c, k_g, k_gp = jax.random.split(key, 3)

        # Critic: maximize critic(real) - critic(fake) (+ GP), refreshing
        # the spectral-norm power-iteration state.
        out = model.apply({"params": params}, imgs, k_c, train=False)
        fake = jax.lax.stop_gradient(out["recon"])

        def c_loss(cp):
            cv = {"params": cp, "spectral": c_spec}
            from emx.nn.vaegan import gradient_penalty

            real_s, spec1 = critic.apply(cv, imgs, mutable=["spectral"])
            fake_s, spec2 = critic.apply(
                {"params": cp, "spectral": spec1["spectral"]}, fake,
                mutable=["spectral"])
            gp = gradient_penalty(
                lambda x: critic.apply(
                    {"params": cp, "spectral": spec2["spectral"]}, x),
                k_gp, imgs, fake)
            return (jnp.mean(fake_s) - jnp.mean(real_s) + 10.0 * gp,
                    spec2["spectral"])

        (cl, new_spec), cg = jax.value_and_grad(c_loss, has_aux=True)(
            c_params)
        c_up, c_state = c_opt.update(cg, c_state)
        c_params = optax.apply_updates(c_params, c_up)

        def g_loss(p):
            total, parts = vaegan_losses(
                model, {"params": p}, critic,
                {"params": c_params, "spectral": new_spec}, imgs, k_g,
                weights=VAEGANLossWeights(kl=kl_weight, wass=w))
            return total, parts

        (gl, parts), gg = jax.value_and_grad(g_loss, has_aux=True)(params)
        g_up, g_state = g_opt.update(gg, g_state)
        params = optax.apply_updates(params, g_up)
        return params, g_state, c_params, new_spec, c_state, parts["mse"]

    params, c_params = variables["params"], critic_vars["params"]
    c_spec = critic_vars["spectral"]
    key = jax.random.key(seed + 2)
    mse = None
    n = train.shape[0]
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (batch,), 0, n)
        w = (wass_weight * min(1.0, i / max(steps * 0.5, 1))
             if wass_anneal else wass_weight)
        params, g_state, c_params, c_spec, c_state, mse = step(
            params, g_state, c_params, c_spec, c_state, k,
            jnp.take(train, idx, axis=0),
            jnp.asarray(w, jnp.float32))

    @jax.jit
    def eval_fn(params, val, key):
        out = model.apply({"params": params}, val, key, train=False)
        emb = model.apply({"params": params}, val,
                          method=NestedVAEGAN.embed)
        keys = jax.random.split(key, val.shape[0])
        emb_cut = model.apply({"params": params},
                              jax.vmap(cutout)(keys, val),
                              method=NestedVAEGAN.embed)
        return out["recon"], emb, emb_cut

    recon, emb, emb_cut = eval_fn(params, val, jax.random.key(7))
    d = jnp.sum((emb_cut[:, None] - emb[None]) ** 2, axis=-1)
    top1 = float(jnp.mean(jnp.argmin(d, axis=1) == jnp.arange(len(val))))
    return {"psnr": round(_psnr_mean(recon, val), 2),
            "anchor_const_psnr": round(_const_anchor(val), 2),
            "cutout_top1_retrieval": round(top1, 3),
            "chance": round(1.0 / len(val), 3),
            "final_mse": round(float(mse), 5)}


def run_manifold(steps, scale, size, seed=0):
    """Shared-manifold domain translator (reference
    misc_py/shared_manifold.pyw:945-1035): domain A = micrograph, domain
    B = a simulated second modality (contrast-inverted + blurred).
    Batches are UNPAIRED (independent shuffles); the confuser is trained
    by BCE while the distillers receive the confusion term. Metric:
    A->B translation PSNR on held-out pairs vs the identity anchor
    (feeding A unchanged)."""
    import optax

    from emx.analysis.filters import gaussian_filter
    from emx.nn.manifold import (ManifoldConfig, SharedManifoldTranslator,
                                 manifold_losses)

    cfg = ManifoldConfig(
        enc_features=tuple(max(8, int(f * scale))
                           for f in (32, 64, 128)),
        code_features=max(8, int(128 * scale)),
        dec_features=tuple(max(8, int(f * scale)) for f in (64, 32)),
        disc_features=tuple(max(8, int(f * scale))
                            for f in (32, 64, 128)))
    model = SharedManifoldTranslator(cfg)

    def to_domain_b(a):
        return jax.vmap(lambda x: 1.0 - gaussian_filter(x, 1.5))(a)

    train, val = _data(256, size, 4), _data(16, size, 96)
    train_b = jax.jit(to_domain_b)(train)
    val_b = jax.jit(to_domain_b)(val)
    batch = 8

    variables = model.init(jax.random.key(seed), train[:batch],
                           train_b[:batch], train=False)
    params = variables["params"]
    main_keys = [k for k in params if k != "confuser"]
    m_opt, c_opt = optax.adam(2e-4), optax.adam(2e-4)
    m_state = m_opt.init({k: params[k] for k in main_keys})
    c_state = c_opt.init(params["confuser"])

    @jax.jit
    def step(params, m_state, c_state, key, a, b):
        def m_loss(mp):
            p = dict(params)
            p.update(mp)
            out = model.apply({"params": p}, a, b, train=True)
            losses = manifold_losses(out, a, b)
            return losses["recon"] + losses["confusion"], losses

        mp = {k: params[k] for k in main_keys}
        (ml, losses), mg = jax.value_and_grad(m_loss, has_aux=True)(mp)
        m_up, m_state = m_opt.update(mg, m_state)
        params = dict(params)
        params.update(optax.apply_updates(mp, m_up))

        def c_loss(cp):
            p = dict(params)
            p["confuser"] = cp
            out = model.apply({"params": p}, a, b, train=True)
            return manifold_losses(out, a, b)["confuser_bce"]

        cl, cg = jax.value_and_grad(c_loss)(params["confuser"])
        c_up, c_state = c_opt.update(cg, c_state)
        params["confuser"] = optax.apply_updates(params["confuser"], c_up)
        return params, m_state, c_state, losses["recon"]

    key = jax.random.key(seed + 2)
    n = train.shape[0]
    recon_l = None
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        ka, kb = jax.random.split(k)
        ia = jax.random.randint(ka, (batch,), 0, n)
        ib = jax.random.randint(kb, (batch,), 0, n)  # unpaired domains
        params, m_state, c_state, recon_l = step(
            params, m_state, c_state, k,
            jnp.take(train, ia, axis=0), jnp.take(train_b, ib, axis=0))

    out = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b,
                                              train=False))(
        params, val, val_b)
    return {"a_to_b_psnr": round(_psnr_mean(out["a_to_b"], val_b), 2),
            "anchor_identity_psnr": round(_psnr_mean(val, val_b), 2),
            "recon_a_psnr": round(_psnr_mean(out["recon_a"], val), 2),
            "anchor_const_psnr": round(_const_anchor(val), 2),
            "final_recon_loss": round(float(recon_l), 5)}


FAMILIES = {
    "small_ae": run_small_ae,
    "xception_ae": run_xception_ae,
    "latent_ae": run_latent_ae,
    "embedder": run_embedder,
    "kernels": run_kernels,
    "vaegan": run_vaegan,
    "manifold": run_manifold,
    "embedder_nce": run_embedder_nce,
    "vaegan_kl01": lambda steps, scale, size: run_vaegan(
        steps, scale, size, kl_weight=0.1),
    # Round-4 levers on the recon-below-anchor negative (VERDICT r3
    # weak-7): anneal the Wasserstein realism term in over the first
    # half of training, or hold it at 0.1.
    "vaegan_anneal": lambda steps, scale, size: run_vaegan(
        steps, scale, size, wass_anneal=True),
    "vaegan_wass01": lambda steps, scale, size: run_vaegan(
        steps, scale, size, wass_weight=0.1),
}


def main(out_dir: str = "docs/runs/zoo_ladder", steps: int = 1500,
         scale: float = 0.25, size: int = 96,
         families: list[str] | None = None) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "quality.json")
    results: dict = {}
    if os.path.exists(path):  # resume family-by-family
        with open(path) as f:
            results = json.load(f).get("families", results)
    for name in families or FAMILIES:
        if name in results and "error" not in results[name]:
            continue  # resume: keep completed families, retry errored
        t0 = time.perf_counter()
        try:
            r = FAMILIES[name](steps, scale, size)
        except Exception as e:
            r = {"error": str(e)[:300]}
        r["seconds"] = round(time.perf_counter() - t0, 1)
        results[name] = r
        print(json.dumps({"family": name, **r}), flush=True)
        with open(path, "w") as f:
            json.dump({"metric": "zoo_ladder", "steps": steps,
                       "scale": scale, "size": size,
                       "families": results}, f, indent=1)
    summary = {"metric": "zoo_ladder", "steps": steps, "scale": scale,
               "size": size, "families": results}
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/zoo_ladder",
         int(a[1]) if len(a) > 1 else 1500,
         float(a[2]) if len(a) > 2 else 0.25,
         int(a[3]) if len(a) > 3 else 96)
