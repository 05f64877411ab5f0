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


FAMILIES = {
    "small_ae": run_small_ae,
    "xception_ae": run_xception_ae,
    "latent_ae": run_latent_ae,
    "embedder": run_embedder,
    "kernels": run_kernels,
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
