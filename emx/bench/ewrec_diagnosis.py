"""Why the EWREC noiseless accuracy saturates (VERDICT r4 weak-8/next-6).

The round-4 accuracy row (docs/runs/ewrec_r4_accuracy.json) measured
complex corr 0.963 on the synthetic stack even NOISELESS, and the
ceiling barely moved with dose (0.9632 -> 0.9616 at dose 25). Dose
independence is the signature of an information bound, not an
optimization failure: defocus phase transfer is sin(chi) with
chi = pi * lambda * df * k^2, so the transfer of PHASE information
vanishes quadratically toward k=0 — a focal series cannot determine the
near-DC band of the object phase no matter the algorithm (the classical
focal-series 'missing low-frequency' limit; the reference's refinement
stage, misc_py/ewrec_class.py:629-649, tunes defocuses and cannot lift
it either).

This module settles it with four rows on the SAME synthetic stack the
accuracy bench uses:

  1. iteration sweep — noiseless corr at 50/200/1000 GS iterations: a
     convergence problem rises, an information bound stays flat;
  2. linear-inversion control — weak_phase_reconstruct (Tikhonov least
     squares, no GS at all) on the same stack: an algorithm-independent
     estimate of what the data determines;
  3. transfer-band ideal — the analytic ceiling: corr between the true
     wave and the true wave with its phase/log-amplitude spectra
     band-limited to frequencies the stack actually transfers
     (max_i |sin chi_i(k)| >= t); if GS sits at this ceiling, GS is
     extracting everything the data contains;
  4. banded-object control — the same pipeline on an object whose phase
     lives entirely in well-transferred bands must reconstruct to
     corr >= 0.99, proving the machinery (not the physics) is exact.

Plus the refine_defocuses row the verdict asked for: perturb the true
defocuses by +-5%, refine by gradient descent on the reconstruction
loss, and report corr before/after.

Usage: python -m emx.bench.ewrec_diagnosis [side] [n_slices]
Writes one JSON line (redirect to docs/runs/ewrec_r5_diagnosis.json).
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from emx.recon.ewrec import (EWRECConfig, reconstruct, refine_defocuses,
                             weak_phase_reconstruct)


def _corr(w1, w2, side):
    c = side // 8
    w1 = w1[c:-c, c:-c]
    w2 = w2[c:-c, c:-c]
    num = jnp.abs(jnp.sum(w1 * jnp.conj(w2)))
    den = jnp.sqrt(jnp.sum(jnp.abs(w1) ** 2)
                   * jnp.sum(jnp.abs(w2) ** 2))
    return num / jnp.maximum(den, 1e-12)


def _image_stack(wave, defocuses, cfg):
    from emx.physics.propagate import propagate_back_to_defocus

    @jax.jit
    def run(wr, wi, dfs):
        def one(df):
            return jnp.abs(propagate_back_to_defocus(
                wr + 1j * wi, df, cfg.wavelength,
                px_dim=cfg.px_dim)) ** 2
        return jax.vmap(one)(dfs)

    return np.asarray(run(jnp.asarray(wave.real), jnp.asarray(wave.imag),
                          defocuses))


def main(side: int = 256, n_slices: int = 15) -> dict:
    cfg = EWRECConfig(wavelength=0.025)
    rng = np.random.default_rng(7)

    # The accuracy bench's object (smooth ~ near-DC spectra).
    def smooth(s=8.0):
        g = rng.normal(size=(side, side))
        f = np.fft.fftfreq(side)
        m = np.exp(-0.5 * (f[:, None] ** 2 + f[None, :] ** 2)
                   * (s * side) ** 2 / 4)
        x = np.fft.ifft2(np.fft.fft2(g) * m).real
        return (x - x.min()) / max(x.max() - x.min(), 1e-9)

    phase = 1.2 * (smooth() - 0.5)
    amp = 0.8 + 0.2 * smooth()
    true_wave = (amp * np.exp(1j * phase)).astype(np.complex64)
    defocuses = jnp.asarray(np.linspace(-700, 700, n_slices), jnp.float32)
    ints = _image_stack(true_wave, defocuses, cfg)
    amps = jnp.sqrt(jnp.maximum(jnp.asarray(ints, jnp.float32), 0.0))
    true_j = jnp.asarray(true_wave)

    out: dict = {"metric": "ewrec_noiseless_diagnosis", "side": side,
                 "n_slices": n_slices, "defocus_range": [-700.0, 700.0]}

    # 1) Iteration sweep: information bound vs unconverged GS.
    sweep = {}
    for it in (50, 200, 1000):
        w = reconstruct(amps, defocuses,
                        EWRECConfig(wavelength=0.025, num_iter=it))
        sweep[str(it)] = round(float(_corr(w, true_j, side)), 4)
    out["gs_corr_vs_iters"] = sweep

    # 2) Linear-inversion control (no GS): what the data determines.
    wlin = weak_phase_reconstruct(jnp.asarray(ints, jnp.float32),
                                  defocuses, cfg)
    out["weak_phase_corr"] = round(float(_corr(wlin, true_j, side)), 4)

    # 3) Analytic transfer-band ceiling: band-limit the TRUE object's
    # phase / log-amplitude to the frequencies the stack transfers.
    f = np.fft.fftfreq(side, d=cfg.px_dim)
    k2 = f[:, None] ** 2 + f[None, :] ** 2
    chi = (np.pi * cfg.wavelength
           * np.asarray(defocuses)[:, None, None] * k2[None])
    strength = np.max(np.abs(np.sin(chi)), axis=0)
    ceilings = {}
    for thresh in (0.05, 0.1, 0.2):
        keep = (strength >= thresh) | (k2 == 0.0)  # DC of amp is known
        logamp = np.log(np.maximum(np.abs(true_wave), 1e-6))
        ph_f = np.fft.ifft2(np.fft.fft2(phase) * keep).real
        la_f = np.fft.ifft2(np.fft.fft2(logamp) * keep).real
        ideal = np.exp(la_f) * np.exp(1j * ph_f)
        ceilings[f"t{thresh}"] = round(
            float(_corr(jnp.asarray(ideal.astype(np.complex64)),
                        true_j, side)), 4)
    out["transfer_band_ceiling"] = ceilings
    out["untransferred_energy_frac_t0.1"] = round(float(
        (np.abs(np.fft.fft2(phase)) ** 2 * (strength < 0.1)).sum()
        / (np.abs(np.fft.fft2(phase)) ** 2).sum()), 4)

    # 4) Banded-object control: phase in well-transferred bands only.
    g = rng.normal(size=(side, side)) + 1j * rng.normal(size=(side, side))
    kmag = np.sqrt(k2)
    band = (kmag > 0.05) & (kmag < 0.15)
    bph = np.fft.ifft2(np.fft.fft2(np.real(np.fft.ifft2(
        g * band))) * band).real
    bph = 0.6 * bph / max(np.abs(bph).max(), 1e-9)
    banded_wave = np.exp(1j * bph).astype(np.complex64)
    bints = _image_stack(banded_wave, defocuses, cfg)
    bamps = jnp.sqrt(jnp.maximum(jnp.asarray(bints, jnp.float32), 0.0))
    wb = reconstruct(bamps, defocuses,
                     EWRECConfig(wavelength=0.025, num_iter=200))
    out["banded_object_gs_corr"] = round(
        float(_corr(wb, jnp.asarray(banded_wave), side)), 4)

    # 5) Defocus-geometry sensitivity + refinement (verdict next-6).
    # Measured finding (this module's first run, and the reason the
    # refine_defocuses row is reported as a sensitivity row): GS with
    # amplitude replacement is INSENSITIVE to per-slice defocus error —
    # +-5% and +-20% perturbations leave the banded reconstruction at
    # corr ~1.0 — and for the same reason per-slice gradient refinement
    # is ill-posed on a pure-defocus simulator: both the GS loss and the
    # weak-phase residual descend BELOW their true-geometry value while
    # the defocus RMS error grows (overfitting N free parameters on a
    # shallow surface). The reference's refinement stage
    # (ewrec_class.py:629-649) targets real stacks whose geometry is
    # unknown; on ground-truth synthetics there is nothing for it to
    # recover. refine_defocuses is still exercised and its df-RMS drift
    # recorded so the ill-posedness stays measured, not assumed.
    sens = {"corr_true_df": out["banded_object_gs_corr"]}
    for frac in (0.05, 0.2):
        pert = defocuses * (1.0 + jnp.asarray(
            rng.uniform(-frac, frac, n_slices), jnp.float32))
        w_pert = reconstruct(bamps, pert,
                             EWRECConfig(wavelength=0.025, num_iter=200))
        sens[f"corr_perturbed_{int(frac * 100)}pct"] = round(
            float(_corr(w_pert, jnp.asarray(banded_wave), side)), 4)
        if frac == 0.05:
            refined = refine_defocuses(bamps, pert, cfg, steps=60,
                                       lr=2.0)
            w_ref = reconstruct(bamps, refined,
                                EWRECConfig(wavelength=0.025,
                                            num_iter=200))
            sens["corr_refined_df"] = round(
                float(_corr(w_ref, jnp.asarray(banded_wave), side)), 4)
            sens["df_rms_before"] = round(float(jnp.sqrt(jnp.mean(
                (pert - defocuses) ** 2))), 2)
            sens["df_rms_after"] = round(float(jnp.sqrt(jnp.mean(
                (refined - defocuses) ** 2))), 2)
    out["defocus_sensitivity"] = sens
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 256, int(a[1]) if len(a) > 1 else 15)
