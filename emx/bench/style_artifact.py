"""Style-transfer visual regression artifact (VERDICT r2 item 9).

Runs the Gatys-style optimisation on a FIXED (seed, content, style)
pair and checks in the content/style/output images plus the Gram-loss
trajectory, giving the random-basis feature substitution evidence
beyond "loss decreases": the output's style-Gram distance must close
most of the gap from content to style while retaining content
structure (correlation with the content image).
Reference: machine_learning/style_transfer.py:125-204.

Usage: python -m emx.bench.style_artifact [out_dir] [size] [steps]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _style_gram_distance(img, style, feature_fn):
    from emx.analysis.stats import gram_matrix
    from emx.nn.style import STYLE_LAYERS

    fi = feature_fn(img)
    fs = feature_fn(style)
    d = 0.0
    for layer in STYLE_LAYERS:
        gi = gram_matrix(fi[layer][0])
        gs = gram_matrix(fs[layer][0])
        d += float(jnp.mean((gi - gs) ** 2))
    return d


def main(out_dir: str = "docs/runs/style_r3", size: int = 128,
         steps: int = 300) -> dict:
    from emx.data.pipeline import synthetic_micrographs
    from emx.io.tiff import write_tiff
    from emx.nn.style import StyleTransferConfig, make_feature_fn, \
        transfer_style

    os.makedirs(out_dir, exist_ok=True)
    content = jnp.asarray(synthetic_micrographs(1, size, seed=42)[0])
    # Style: strong directional lattice fringes (a STEM texture).
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    style = 0.5 + 0.25 * np.sin(2 * np.pi * 24 * (0.8 * xx + 0.6 * yy)) \
        + 0.25 * np.sin(2 * np.pi * 31 * (0.6 * xx - 0.8 * yy))
    style = jnp.asarray((style - style.min()) / (style.max() - style.min()))

    cfg = StyleTransferConfig(steps=steps, seed=0)
    feature_fn = make_feature_fn(size, cfg.seed)
    out = transfer_style(content, style, cfg, feature_fn=feature_fn)

    d_content = _style_gram_distance(content, style, feature_fn)
    d_out = _style_gram_distance(out, style, feature_fn)
    corr = float(np.corrcoef(np.asarray(out).ravel(),
                             np.asarray(content).ravel())[0, 1])

    write_tiff(os.path.join(out_dir, "content.tif"), np.asarray(content))
    write_tiff(os.path.join(out_dir, "style.tif"), np.asarray(style))
    write_tiff(os.path.join(out_dir, "output.tif"), np.asarray(out))
    summary = {
        "metric": "style_transfer_artifact",
        "size": size, "steps": steps,
        "style_gram_dist_content": round(d_content, 6),
        "style_gram_dist_output": round(d_out, 6),
        "gram_gap_closed": round(1.0 - d_out / max(d_content, 1e-12), 4),
        "content_correlation": round(corr, 4),
        "ok": bool(d_out < 0.5 * d_content and corr > 0.3),
    }
    with open(os.path.join(out_dir, "quality.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "docs/runs/style_r3",
         int(a[1]) if len(a) > 1 else 128,
         int(a[2]) if len(a) > 2 else 300)
