"""Smoke coverage for the zoo-ladder family runners added in round 3
(vaegan, manifold). The chip ladder (emx.bench.zoo_ladder.main) trains
them for real; here we drive each runner end-to-end at toy size so API
drift in the underlying modules (emx/nn/vaegan.py, emx/nn/manifold.py)
is caught by CI. Reference behaviors covered: misc_py/ga-vae.py:852-1050
(WGAN-GP alternation + siamese views), misc_py/shared_manifold.pyw:
945-1035 (unpaired domains, confuser BCE vs confusion)."""

import numpy as np


def test_run_vaegan_tiny():
    from emx.bench.zoo_ladder import run_vaegan

    r = run_vaegan(steps=2, scale=0.1, size=32)
    assert set(r) >= {"psnr", "anchor_const_psnr",
                      "cutout_top1_retrieval", "chance", "final_mse"}
    assert np.isfinite(r["psnr"]) and np.isfinite(r["final_mse"])
    assert 0.0 <= r["cutout_top1_retrieval"] <= 1.0


def test_run_manifold_tiny():
    from emx.bench.zoo_ladder import run_manifold

    r = run_manifold(steps=2, scale=0.1, size=32)
    assert set(r) >= {"a_to_b_psnr", "anchor_identity_psnr",
                      "recon_a_psnr", "anchor_const_psnr",
                      "final_recon_loss"}
    assert np.isfinite(r["a_to_b_psnr"])
    assert np.isfinite(r["final_recon_loss"])
