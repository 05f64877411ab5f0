"""Neural style transfer: optimisation-based (Gatys) and fast feed-forward
restyling with multi-style guidance.

Capability rebuild of reference machine_learning/style_transfer.py:38-416
(VGG19 Gram-matrix optimisation, content layer conv4_2, five style layers
weighted 0.2 each) and guided-fast-style-fusion.py:52-951 (feed-forward
restyling network trained against multi-style Gram losses with
similarity-weighted guidance and optional conservation masks).

The reference depends on pretrained VGG19 weights from a .mat file; this
environment has no internet, so the feature extractor is pluggable: a
`FeatureExtractor` protocol of {layer_name: (H, W, C) activation}. The
default is a fixed random-weight multi-scale conv pyramid — random
conv features are an established basis for texture/style statistics — and
any trained emx trunk (e.g. UnsupervisedEmbedder) can be slotted in.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from emx.analysis.stats import gram_matrix


class ConvPyramidFeatures(nn.Module):
    """Fixed 5-level conv/avg-pool pyramid (VGG-like topology) used as the
    style/content feature basis. Initialise once; weights stay frozen."""

    features: tuple[int, ...] = (32, 64, 128, 128, 128)

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        if x.ndim == 2:
            x = x[None, ..., None]
        elif x.ndim == 3:
            x = x[..., None]
        acts = {}
        h = x
        for i, f in enumerate(self.features, start=1):
            h = nn.Conv(f, (3, 3), padding="SAME", name=f"conv{i}")(h)
            h = nn.relu(h)
            acts[f"conv{i}_1"] = h
            if i < len(self.features):
                h = nn.avg_pool(h, (2, 2), strides=(2, 2), padding="SAME")
        acts["content"] = acts["conv4_1"]
        return acts


def make_feature_fn(size: int, seed: int = 0) -> Callable:
    model = ConvPyramidFeatures()
    variables = model.init(jax.random.key(seed), jnp.zeros((1, size, size)))

    def feature_fn(img):
        return model.apply(variables, img)

    return feature_fn


STYLE_LAYERS = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1")


def style_content_loss(
    feats: dict, content_feats: dict, style_grams: list[dict],
    style_weights: Sequence[float], rel_styles: Sequence[float],
    content_weight: float, style_weight: float,
):
    c = feats["content"]
    p = content_feats["content"]
    content_loss = 0.5 * jnp.sum((c - p) ** 2) / c.size

    style_loss = 0.0
    for grams, rel in zip(style_grams, rel_styles):
        for layer, w in zip(STYLE_LAYERS, style_weights):
            g = gram_matrix(feats[layer][0])
            style_loss = style_loss + rel * w * jnp.mean((g - grams[layer]) ** 2)
    return content_weight * content_loss + style_weight * style_loss


@dataclasses.dataclass
class StyleTransferConfig:
    content_weight: float = 1.0
    style_weight: float = 200.0
    style_layer_weights: tuple[float, ...] = (0.2, 0.2, 0.2, 0.2, 0.2)
    steps: int = 300
    learning_rate: float = 0.05
    input_noise: float = 0.1
    seed: int = 0


def transfer_style(
    content: jax.Array,
    styles: jax.Array | Sequence[jax.Array],
    cfg: StyleTransferConfig = StyleTransferConfig(),
    feature_fn: Callable | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Optimise an image to carry `content`'s structure with the style
    statistics of `styles` (Gatys; reference transfer_style:38-281).
    `mask`: 1.0 pixels are conserved from the content image
    (guided-fast-style-fusion's conservation mask)."""
    content = jnp.asarray(content, jnp.float32)
    if isinstance(styles, (list, tuple)):
        style_list = [jnp.asarray(s, jnp.float32) for s in styles]
    else:
        style_list = [jnp.asarray(styles, jnp.float32)]
    size = content.shape[-1]
    feature_fn = feature_fn or make_feature_fn(size, cfg.seed)

    content_feats = feature_fn(content)
    style_grams = []
    for s in style_list:
        f = feature_fn(s)
        style_grams.append({
            layer: gram_matrix(f[layer][0]) for layer in STYLE_LAYERS
        })
    rel = [1.0 / len(style_list)] * len(style_list)

    key = jax.random.key(cfg.seed)
    canvas = content + cfg.input_noise * jax.random.normal(key, content.shape)

    def loss_fn(img):
        feats = feature_fn(img)
        loss = style_content_loss(
            feats, content_feats, style_grams, cfg.style_layer_weights, rel,
            cfg.content_weight, cfg.style_weight,
        )
        if mask is not None:
            loss = loss + 10.0 * jnp.mean(mask * (img - content) ** 2)
        return loss

    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(canvas)

    @jax.jit
    def step(img, s):
        loss, g = jax.value_and_grad(loss_fn)(img)
        updates, s = opt.update(g, s)
        return optax.apply_updates(img, updates), s, loss

    for _ in range(cfg.steps):
        canvas, opt_state, _ = step(canvas, opt_state)
    return jnp.clip(canvas, 0.0, 1.0)


class RestyleNet(nn.Module):
    """Feed-forward restyling network (guided-fast-style-fusion
    architecture:52-288 shape): strided encoder, NiN-style residual middle,
    resize-conv decoder."""

    features: tuple[int, int, int] = (32, 64, 128)
    num_blocks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        from emx.nn.blocks import Norm, SepConvBlock, XceptionMiddleBlock

        squeeze = x.ndim == 3
        if squeeze:
            x = x[..., None]
        f0, f1, f2 = self.features
        h = SepConvBlock(f0, norm="instance")(x, train)
        h = SepConvBlock(f1, strides=2, norm="instance")(h, train)
        h = SepConvBlock(f2, strides=2, norm="instance")(h, train)
        for _ in range(self.num_blocks):
            h = XceptionMiddleBlock(f2, norm="instance")(h, train)
        for f in (f1, f0):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), method="linear")
            h = nn.Conv(f, (3, 3), padding="SAME")(h)
            h = Norm("instance")(h, train)
            h = nn.relu(h)
        out = nn.Conv(1, (3, 3), padding="SAME")(h)
        out = jax.nn.sigmoid(out)
        return out[..., 0] if squeeze else out


def train_fast_restyler(
    content_batches,
    styles,
    cfg: StyleTransferConfig = StyleTransferConfig(),
    num_steps: int = 200,
    feature_fn: Callable | None = None,
):
    """Train RestyleNet against the multi-style Gram losses
    (guided-fast-style-fusion train loop:290-951). `content_batches`
    yields (B, H, W) float arrays."""
    it = iter(content_batches)
    first = jnp.asarray(next(it), jnp.float32)
    size = first.shape[-1]
    feature_fn = feature_fn or make_feature_fn(size, cfg.seed)
    style_list = [jnp.asarray(s, jnp.float32) for s in (
        styles if isinstance(styles, (list, tuple)) else [styles]
    )]
    style_grams = []
    for s in style_list:
        f = feature_fn(s)
        style_grams.append({
            layer: gram_matrix(f[layer][0]) for layer in STYLE_LAYERS
        })
    rel = [1.0 / len(style_list)] * len(style_list)

    net = RestyleNet()
    variables = net.init(jax.random.key(cfg.seed), first, train=False)
    params = variables["params"]
    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(params)

    def loss_fn(p, batch):
        out = net.apply({"params": p}, batch, train=True)
        loss = 0.0
        for i in range(batch.shape[0]):
            feats = feature_fn(out[i])
            cfeats = feature_fn(batch[i])
            loss = loss + style_content_loss(
                feats, cfeats, style_grams, cfg.style_layer_weights, rel,
                cfg.content_weight, cfg.style_weight,
            )
        return loss / batch.shape[0]

    @jax.jit
    def step(p, s, batch):
        loss, g = jax.value_and_grad(loss_fn)(p, batch)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    batch = first
    losses = []
    for i in range(num_steps):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
        try:
            batch = jnp.asarray(next(it), jnp.float32)
        except StopIteration:
            it = iter(content_batches)
            batch = jnp.asarray(next(it), jnp.float32)
    return net, {"params": params}, losses
