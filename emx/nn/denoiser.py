"""Flagship low-dose micrograph denoiser.

DeepLabv3+-style atrous separable-conv encoder-decoder, the architecture
of the reference's north-star workload (misc_py/denoiser-multi-gpu.py
architecture():200-540):

  encoder  : 5 blocks; blocks 0-3 end in a stride-2 separable conv with a
             1x1 stride-2 conv residual; block 4 is stride-1 with an
             identity residual
  middle   : 11 Xception middle blocks at 728 features
  ASPP     : rates 6/12/18 + image-level pooling, projected to 256
  decoder  : bilinear x4 upsample, two skip-concat stages (encoder taps at
             1/4 and 1/2 resolution) each with a 1x1-conv residual, then a
             final stride-2 transpose conv stage and a 1-channel head
  output   : clip to [0, 1]

Defaults follow the reference's feature widths (64/128/256/728/728,
denoiser-multi-gpu.py:50-63). `scale` shrinks every width for tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from emx.nn.blocks import ASPP, ConvBlock, DeconvBlock, SepConvBlock, XceptionMiddleBlock


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    features: tuple[int, ...] = (64, 128, 256, 728, 728)
    num_middle_blocks: int = 11
    aspp_filters: int = 728
    aspp_out: int = 256
    aspp_rates: tuple[int, ...] = (6, 12, 18)
    norm: str = "group"  # TPU default; 'batch' reproduces the reference
    axis_name: str | None = None
    # Measured on v5e (512^2, bf16): ConvTranspose beats resize+sepconv
    # (213 vs 175 img/s @ b16) — the model is HBM-bound at high res, and
    # space_to_depth is the dominant inference lever: s2d=1 ~213 img/s,
    # s2d=2 1569 img/s, s2d=4 6572 img/s (b96, 64-deep chains). Quality
    # at PRODUCTION widths (20k steps on-chip, docs/runs/quality_*):
    # s2d=2 36.4 dB (beats all classical filters) >> s2d=4+frh 30.1 >>
    # plain s2d=4 22.6 (below the noisy input) — so 2 is the deployment
    # default and 4 is a throughput/screening profile only.
    aspp_separable: bool = True
    upsample: str = "transpose"
    space_to_depth: int = 2
    dtype: Any = jnp.float32
    # Rematerialise the middle-block activations in backward: trades
    # FLOPs for HBM so training batches can grow to the memory limit.
    remat_middle: bool = False
    # Light full-resolution refinement after depth_to_space. Measured at
    # production widths (docs/runs/quality_*): plain s2d=4 converges to
    # 22.6 dB val PSNR — BELOW the noisy input (4x4 blocking; the head
    # predicts 16 pixels per site from quarter-res features) — while
    # s2d=2 reaches 36.4 dB. A few thin convs at full res restore the
    # fine detail the folded head cannot express. The refinement stage
    # is fed the RAW full-resolution input alongside the upsampled body
    # prediction (round-3 change): the noisy input carries the high-
    # frequency detail the folded body cannot, so the head becomes a
    # locally-guided denoiser rather than a blind sharpener.
    full_res_head: int = 0  # feature width; 0 disables
    # Mid-resolution refinement head (round 3): for s2d=4, first
    # depth_to_space by `mid_res_factor` (to half resolution, where a
    # 2x2 fold of the raw input is losslessly available as 4 channels),
    # refine with `mid_res_depth` sep convs at width `mid_res_head`
    # concat'd with the folded input, THEN predict the remaining 2x2
    # block. This reproduces the head geometry that makes s2d=2 good
    # (2x2 prediction from half-res features with full input access) on
    # top of the 4x-cheaper s2d=4 body; half-res refinement costs ~1/4
    # of a full-res head of the same width.
    mid_res_head: int = 0  # feature width; 0 disables
    mid_res_factor: int = 2
    mid_res_depth: int = 2
    # Kernel-prediction head (round 3): the body predicts, per OUTPUT
    # pixel, softmax mixing weights over a basis of candidate estimates
    # {body value, raw input, kernel_pred_head Gaussian blurs of the
    # input} — per-pixel adaptive smoothing (KPN-style) at a fraction of
    # a refinement head's bandwidth: the full-res work is K separable
    # blurs + one weighted sum. The best classical filter on the val
    # ladder IS a fixed Gaussian (36.01 dB), so a body-guided per-pixel
    # blend of Gaussian scales strictly generalises it while the body
    # value channel supplies the nonlinear estimate.
    kernel_pred_head: int = 0  # number of Gaussian scales; 0 disables
    kernel_pred_sigmas: tuple[float, ...] = (1.0, 2.0, 4.0)
    # Folded-space refinement head (round 3, the lane-efficient design):
    # measured on v5e, EVERY unfolded full/mid-res refinement variant
    # (full_res_head, mid_res_head, kernel_pred_head) pays a large tax
    # because tensors with < 128 channels waste TPU vector lanes
    # (1-48 ch at 256-512^2 run at 1-40% lane efficiency). Instead:
    # concat the s2d-FOLDED raw input (s2d^2 channels, lossless — every
    # input pixel is present) onto the body-resolution features and
    # refine at `folded_head` width (128 = full lane width) BEFORE the
    # head conv. A folded conv mixes sub-pixel positions jointly
    # (a 2x2/4x4 block-wise operator), so the head predicts each
    # sub-pixel with full input detail at ~1/16 the unfolded cost.
    folded_head: int = 0  # feature width; 0 disables
    folded_head_depth: int = 2
    # Output dtype of the clipped prediction. float32 is the reference
    # contract; 'bfloat16' halves the output-path HBM traffic (the
    # final clip + depth_to_space tensors at full resolution) for
    # serving — [0,1] values round at ~2^-9, adding ~3e-7 MSE, i.e.
    # <0.05 dB at the flagship's 43 dB operating point.
    out_dtype: str = "float32"

    @classmethod
    def tiny(cls) -> "DenoiserConfig":
        return cls(features=(8, 12, 16, 24, 24), num_middle_blocks=1,
                   aspp_filters=16, aspp_out=16)

    def scaled(self, scale: float) -> "DenoiserConfig":
        return dataclasses.replace(
            self,
            features=tuple(max(8, int(f * scale)) for f in self.features),
            aspp_filters=max(8, int(self.aspp_filters * scale)),
            aspp_out=max(8, int(self.aspp_out * scale)),
        )

    def halo_grid(self) -> int:
        """Alignment unit for spatial (halo) parallelism: shard heights
        and halos must be multiples of the total downsampling stride so
        every shard's conv grid coincides with the global grid."""
        return self.space_to_depth * 16  # 4 stride-2 encoder stages

    def receptive_field_radius(self) -> int:
        """Theoretical receptive-field radius in INPUT pixels — an upper
        bound: the effective radius of a trained net is far smaller (the
        reference used 80 px overlap on 512 px tiles,
        machine_learning/denoiser.py:653-682), and at full depth this
        bound exceeds any practical halo/tile overlap, so halo-parallel
        outputs are validated against tiled inference within tolerance
        rather than bit-exactly. (The ASPP 'image-level' branch is a 2x2
        avg pool in the reference — denoiser-multi-gpu.py:331-336 — not a
        global pool, so the field IS finite.)"""
        r, s = 0, 1
        for _ in range(4):          # encoder blocks 0-3
            r += 2 * s              # two 3x3 sep convs
            r += s                  # strided 3x3
            s *= 2
        r += 3 * s                  # encoder block 4
        r += 3 * s * self.num_middle_blocks
        r += max(self.aspp_rates) * s   # largest dilated 3x3 branch
        r += 2 * s                  # bilinear x4 upsample support
        s //= 4
        r += 3 * s                  # decoder stage 1 (+ transpose conv)
        s //= 2
        r += 3 * s                  # decoder stage 2
        s //= 2
        r += 2 * s + 1              # full-res refinement + 3x3 head
        if self.folded_head:
            r += 3 * self.folded_head_depth  # folded convs at body res
        if self.mid_res_head:
            # refinement sep convs + head conv at mid resolution
            r += (3 * self.mid_res_depth + 3) * max(
                1, self.space_to_depth // self.mid_res_factor)
        r *= self.space_to_depth
        if self.kernel_pred_head:
            # widest Gaussian basis blur acts at full input resolution
            r += int(3 * max(
                self.kernel_pred_sigmas[: self.kernel_pred_head]))
        return r


def _space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """Fold f x f spatial blocks into channels (encoder convention)."""
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh // f, f, ww // f, f, c)
    return jnp.moveaxis(x, 2, 4).reshape(b, hh // f, ww // f, f * f * c)


def _depth_to_space(x: jax.Array, f: int) -> jax.Array:
    """Unfold channels into f x f spatial blocks (head convention)."""
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh, ww, f, f, c // (f * f))
    return jnp.moveaxis(x, 3, 2).reshape(b, hh * f, ww * f, c // (f * f))


def _gaussian_blur_nhwc(x: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur of an NHWC(C=1) tensor, SAME edge
    (reflect-free zero pad is fine: the basis is learned against)."""
    radius = max(1, int(3.0 * sigma))
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (t / sigma) ** 2)
    k = (k / jnp.sum(k)).astype(x.dtype)
    x = jnp.moveaxis(x, -1, 1)  # NCHW
    x = jax.lax.conv_general_dilated(
        x, k[None, None, :, None], (1, 1),
        padding=((radius, radius), (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, k[None, None, None, :], (1, 1),
        padding=((0, 0), (radius, radius)))
    return jnp.moveaxis(x, 1, -1)


class Denoiser(nn.Module):
    config: DenoiserConfig = DenoiserConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        f = cfg.features
        kw = dict(norm=cfg.norm, axis_name=cfg.axis_name, dtype=cfg.dtype)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[..., None]
        x = x.astype(cfg.dtype)
        x_in = x  # raw full-resolution input for the refinement heads

        s2d = cfg.space_to_depth
        if s2d > 1:
            # Fold space into channels so the most expensive (full-res)
            # stages run at lower resolution with wider, MXU-friendlier
            # channels; inverted at the head with depth_to_space.
            b, hh, ww, c = x.shape
            x = x.reshape(b, hh // s2d, s2d, ww // s2d, s2d, c)
            x = jnp.moveaxis(x, 2, 4).reshape(
                b, hh // s2d, ww // s2d, s2d * s2d * c
            )

        taps = []  # encoder outputs at each stride-2 boundary

        # Encoder blocks 0..3: two stride-1 sep convs, one stride-2 sep conv,
        # plus a 1x1 stride-2 projection residual.
        h = x
        # Feature plan from the reference: block i runs at f[i]; its strided
        # conv emits f[1] for block 0, else f[i].
        for i in range(4):
            run = f[i]
            emit = f[1] if i == 0 else f[i]
            a = SepConvBlock(run, **kw)(h, train)
            a = SepConvBlock(run, **kw)(a, train)
            down = SepConvBlock(emit, strides=2, **kw)(a, train)
            res = ConvBlock(emit, kernel=1, strides=2, **kw)(h, train)
            h = down + res
            taps.append(h)

        # Encoder block 4: three stride-1 sep convs + identity residual.
        a = SepConvBlock(f[4], **kw)(h, train)
        a = SepConvBlock(f[4], **kw)(a, train)
        a = SepConvBlock(f[4], **kw)(a, train)
        h = a + h

        middle = XceptionMiddleBlock
        if cfg.remat_middle:
            # static_argnums: (self, x, train) -> train must stay static.
            middle = nn.remat(XceptionMiddleBlock, static_argnums=(2,))
        for i in range(cfg.num_middle_blocks):
            # Explicit name keeps the param tree identical with and
            # without remat, so checkpoints stay interchangeable.
            h = middle(f[4], **kw, name=f"XceptionMiddleBlock_{i}")(h, train)

        h = ASPP(cfg.aspp_filters, cfg.aspp_out, cfg.aspp_rates,
                 separable=cfg.aspp_separable, **kw)(h, train)

        # Decoder: bilinear x4 to 1/4 resolution, skip from taps[1].
        h = jax.image.resize(
            h, (*h.shape[:-3], h.shape[-3] * 4, h.shape[-2] * 4, h.shape[-1]),
            method="linear",
        ).astype(cfg.dtype)
        cat = jnp.concatenate([h, taps[1]], axis=-1)
        d = SepConvBlock(f[2], **kw)(cat, train)
        d = SepConvBlock(f[2], **kw)(d, train)
        d = d + ConvBlock(f[2], kernel=1, **kw)(cat, train)
        h = DeconvBlock(f[2], norm=cfg.norm, axis_name=cfg.axis_name,
                        mode=cfg.upsample, dtype=cfg.dtype)(d, train)

        # Skip from taps[0] at 1/2 resolution.
        cat = jnp.concatenate([h, taps[0]], axis=-1)
        d = SepConvBlock(f[1], **kw)(cat, train)
        d = SepConvBlock(f[1], **kw)(d, train)
        d = d + ConvBlock(f[1], kernel=1, **kw)(cat, train)
        h = DeconvBlock(f[1], norm=cfg.norm, axis_name=cfg.axis_name,
                        mode=cfg.upsample, dtype=cfg.dtype)(d, train)

        # Body-resolution refinement + head.
        d = SepConvBlock(f[0], **kw)(h, train)
        d = SepConvBlock(f[0], **kw)(d, train)
        d = d + ConvBlock(f[0], kernel=1, **kw)(h, train)
        frh = cfg.full_res_head
        mrh = cfg.mid_res_head
        head_ch = frh if frh else 1

        if cfg.folded_head and s2d > 1:
            # Lane-efficient refinement in folded space with the
            # losslessly folded raw input as a skip.
            x_fold = _space_to_depth(x_in, s2d)
            cat = jnp.concatenate([d, x_fold], axis=-1)
            r = cat
            for _ in range(cfg.folded_head_depth):
                r = SepConvBlock(cfg.folded_head, **kw)(r, train)
            d = r + ConvBlock(cfg.folded_head, kernel=1, **kw)(cat, train)

        if mrh and s2d > 1:
            # Mid-resolution refinement: unfold by mid_res_factor, refine
            # at width mrh alongside the (losslessly rem-folded) raw
            # input, then predict the remaining rem x rem block.
            m = min(cfg.mid_res_factor, s2d)
            rem = s2d // m
            out = ConvBlock(m * m * mrh, kernel=3, **kw)(d, train)
            out = _depth_to_space(out, m)
            x_mid = _space_to_depth(x_in, rem) if rem > 1 else x_in
            cat = jnp.concatenate([out, x_mid], axis=-1)
            r = cat
            for _ in range(cfg.mid_res_depth):
                r = SepConvBlock(mrh, **kw)(r, train)
            r = r + ConvBlock(mrh, kernel=1, **kw)(cat, train)
            out = ConvBlock(rem * rem * head_ch, kernel=3, **kw)(r, train)
            if rem > 1:
                out = _depth_to_space(out, rem)
        elif cfg.kernel_pred_head and s2d > 1:
            # Kernel-prediction head: per output pixel, one body value v
            # plus softmax logits over the basis {v, x, blur_sigma(x)...}.
            sigmas = cfg.kernel_pred_sigmas[: cfg.kernel_pred_head]
            n_basis = 2 + len(sigmas)
            out = ConvBlock(s2d * s2d * (1 + n_basis), kernel=3, **kw)(
                d, train)
            out = _depth_to_space(out, s2d)
            v = out[..., :1].astype(jnp.float32)
            logits = out[..., 1:].astype(jnp.float32)
            basis = jnp.concatenate(
                [v, x_in.astype(jnp.float32)]
                + [_gaussian_blur_nhwc(x_in, s).astype(jnp.float32)
                   for s in sigmas], axis=-1)
            w = jax.nn.softmax(logits, axis=-1)
            out = jnp.sum(w * basis, axis=-1, keepdims=True)
            out = out.astype(cfg.dtype)
        else:
            out = ConvBlock(s2d * s2d * head_ch, kernel=3, **kw)(d, train)
            if s2d > 1:
                out = _depth_to_space(out, s2d)

        if frh:
            cat = jnp.concatenate([out, x_in], axis=-1)
            r = SepConvBlock(frh, **kw)(cat, train)
            out = ConvBlock(1, kernel=3, **kw)(out + r, train)

        out = jnp.clip(out.astype(cfg.out_dtype), 0.0, 1.0)
        return out[..., 0] if squeeze else out


class FoldedHeadTail(nn.Module):
    """The tail of `Denoiser` as a standalone module (requires folded_head
    on and the other heads off).

    Three capture depths (`scope`):
      * 'head' — folded-space refinement head + output stage; the input
        is the captured concat [body features, folded raw input] feeding
        the first head conv.
      * 'refine' — one stage deeper: also the body-resolution refinement
        block (two f[0] SepConvBlocks + 1x1 skip). The input is
        (h, x_raw): h captured BEFORE the refinement block, x_raw the
        raw (b, H, W) network input (the module re-derives the folded
        skip itself, matching Denoiser's casting exactly).
      * 'decoder' — deeper still: also the second decoder stage (two
        f[1] SepConvBlocks + 1x1 skip + DeconvBlock). The input is
        (cat2, x_raw): cat2 the captured concat [decoder features,
        encoder tap 0] feeding that stage's first conv.
      * 'decoder2' — the whole decoder: also the first decoder stage
        (two f[2] SepConvBlocks + 1x1 skip + DeconvBlock). The input is
        (cat1, tap0, x_raw): cat1 the captured concat [upsampled ASPP
        features, encoder tap 1] feeding that stage's first conv, tap0
        the encoder tap the second stage concatenates (sliced from the
        second stage's captured concat: its first f[2] channels are the
        tail's own DeconvBlock output, recomputed here).

    Block classes and call order match the tail of Denoiser exactly, so
    parameters map 1:1 via `tail_param_names`. Used by
    emx.bench.qat_finetune's tail-distillation modes, which train the
    tail standalone on features captured from the int8 deployment graph
    (the full fake-quant training graph exceeds the remote-compile
    relay's request ceiling on this host)."""

    config: DenoiserConfig
    tail_scope: str = "head"  # 'scope' is reserved by flax Modules

    @nn.compact
    def __call__(self, inputs, train: bool = False) -> jax.Array:
        cfg = self.config
        assert cfg.folded_head and not cfg.mid_res_head \
            and not cfg.full_res_head and not cfg.kernel_pred_head
        assert self.tail_scope in ("head", "refine", "decoder",
                                   "decoder2")
        kw = dict(norm=cfg.norm, axis_name=cfg.axis_name, dtype=cfg.dtype)
        s2d = cfg.space_to_depth
        if self.tail_scope == "decoder2":
            cat1, tap0, x_raw = inputs
            cat1 = cat1.astype(cfg.dtype)
            d = SepConvBlock(cfg.features[2], **kw)(cat1, train)
            d = SepConvBlock(cfg.features[2], **kw)(d, train)
            d = d + ConvBlock(cfg.features[2], kernel=1, **kw)(cat1, train)
            h = DeconvBlock(cfg.features[2], norm=cfg.norm,
                            axis_name=cfg.axis_name, mode=cfg.upsample,
                            dtype=cfg.dtype)(d, train)
            cat2 = jnp.concatenate([h, tap0.astype(cfg.dtype)], axis=-1)
        if self.tail_scope == "decoder":
            cat2, x_raw = inputs
            cat2 = cat2.astype(cfg.dtype)
        if self.tail_scope in ("decoder", "decoder2"):
            d = SepConvBlock(cfg.features[1], **kw)(cat2, train)
            d = SepConvBlock(cfg.features[1], **kw)(d, train)
            d = d + ConvBlock(cfg.features[1], kernel=1, **kw)(cat2, train)
            h = DeconvBlock(cfg.features[1], norm=cfg.norm,
                            axis_name=cfg.axis_name, mode=cfg.upsample,
                            dtype=cfg.dtype)(d, train)
        elif self.tail_scope == "refine":
            h, x_raw = inputs
            h = h.astype(cfg.dtype)
        if self.tail_scope in ("refine", "decoder", "decoder2"):
            x_in = x_raw[..., None].astype(cfg.dtype)
            d = SepConvBlock(cfg.features[0], **kw)(h, train)
            d = SepConvBlock(cfg.features[0], **kw)(d, train)
            d = d + ConvBlock(cfg.features[0], kernel=1, **kw)(h, train)
            cat = jnp.concatenate(
                [d, _space_to_depth(x_in, s2d)], axis=-1)
        else:
            cat = inputs.astype(cfg.dtype)
        r = cat
        for _ in range(cfg.folded_head_depth):
            r = SepConvBlock(cfg.folded_head, **kw)(r, train)
        d = r + ConvBlock(cfg.folded_head, kernel=1, **kw)(cat, train)
        out = ConvBlock(s2d * s2d, kernel=3, **kw)(d, train)
        if s2d > 1:
            out = _depth_to_space(out, s2d)
        out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
        return out[..., 0]


def tail_param_names(conv_order: list[str], depth: int,
                     scope: str = "head") -> dict[str, str]:
    """Map full-Denoiser top-level param names -> FoldedHeadTail names.

    `conv_order` is calibrate(return_order=True)'s execution-ordered conv
    path list; the tail is its last N distinct top-level CONV-bearing
    modules — N = depth+2 ('head': depth SepConvBlocks, the 1x1 skip
    ConvBlock, the output ConvBlock), depth+5 ('refine': plus the two
    f[0] SepConvBlocks and their 1x1 skip), or depth+8 ('decoder': plus
    the two f[1] SepConvBlocks and their 1x1 skip; the DeconvBlock
    between them holds a ConvTranspose, which calibrate does not see, so
    it is added from the param tree convention: the highest-numbered
    DeconvBlock is the second decoder stage's). FoldedHeadTail creates
    blocks in the same line order Denoiser executes them, so in-order
    renumbering is exact."""
    n_sep = depth + {"head": 0, "refine": 2, "decoder": 4,
                     "decoder2": 6}[scope]
    n_conv = {"head": 2, "refine": 3, "decoder": 4, "decoder2": 5}[scope]
    uniq = list(dict.fromkeys(p.split("/")[0] for p in conv_order))
    if scope in ("decoder", "decoder2") and any(
            u.startswith("DeconvBlock") for u in uniq):
        # resize_sep upsampling puts convs INSIDE the DeconvBlock; only
        # the transpose mode (the flagship's) keeps this slice clean.
        raise ValueError("decoder scope requires upsample='transpose'")
    tail = uniq[-(n_sep + n_conv):]
    mapping: dict[str, str] = {}
    sep_i = conv_i = 0
    for t in tail:
        if t.startswith("SepConvBlock"):
            mapping[t] = f"SepConvBlock_{sep_i}"
            sep_i += 1
        else:
            mapping[t] = f"ConvBlock_{conv_i}"
            conv_i += 1
    assert sep_i == n_sep and conv_i == n_conv, (tail, mapping)
    if scope == "decoder":
        # Denoiser has exactly two DeconvBlocks; the tail's is the last.
        mapping["DeconvBlock_1"] = "DeconvBlock_0"
    elif scope == "decoder2":
        # Both decoder stages are in the tail; numbering coincides.
        mapping["DeconvBlock_0"] = "DeconvBlock_0"
        mapping["DeconvBlock_1"] = "DeconvBlock_1"
    return mapping
