"""Golden regression fixtures: fixed-seed forward outputs of the model zoo
and physics kernels, guarding numerical drift across refactors
(SURVEY.md §4 golden-parity strategy — our fixed-seed outputs stand in
for the reference's unrunnable TF1 frozen graphs).

Regenerate intentionally with:  python tests/test_golden.py regen
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _cases():
    from emx.data.degrade import denoiser_example
    from emx.data.pipeline import synthetic_micrographs
    from emx.nn import Denoiser, DenoiserConfig
    from emx.physics import defocus_ctf, image_stats
    from emx.recon import EWRECConfig, reconstruct

    x = jnp.asarray(synthetic_micrographs(1, 64, seed=123))

    def denoiser_fwd():
        cfg = DenoiserConfig(features=(8, 12, 16, 24, 24),
                             num_middle_blocks=1, aspp_filters=16,
                             aspp_out=16, norm="group")
        model = Denoiser(cfg)
        variables = model.init(jax.random.key(7), x, train=False)
        return model.apply(variables, x, train=False)

    def degrade():
        lq, target = denoiser_example(jax.random.key(11), x[0])
        return jnp.stack([lq, target])

    def ctf():
        return jnp.stack([
            jnp.real(defocus_ctf(64, 0.025, 150.0)),
            jnp.imag(defocus_ctf(64, 0.025, 150.0)),
        ])

    def stats_vec():
        from emx.nn.profiles import stats_to_feature_vector

        return stats_to_feature_vector(image_stats(x[0]))

    def ewrec_wave():
        from emx.physics.propagate import propagate_back_to_defocus

        dfs = jnp.asarray([-150.0, 0.0, 150.0])
        stack = jnp.stack([
            jnp.abs(propagate_back_to_defocus(
                x[0].astype(jnp.complex64), d, 0.025)) ** 2
            for d in dfs
        ])
        wave = reconstruct(jnp.sqrt(stack), dfs, EWRECConfig(num_iter=10))
        return jnp.stack([jnp.abs(wave), jnp.angle(wave)])

    return {
        "denoiser_fwd": denoiser_fwd,
        "degrade": degrade,
        "ctf": ctf,
        "stats_vec": stats_vec,
        "ewrec_wave": ewrec_wave,
    }


def regen():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name, fn in _cases().items():
        np.save(os.path.join(FIXTURE_DIR, f"{name}.npy"), np.asarray(fn()))
        print("wrote", name)


@pytest.mark.parametrize("name", ["denoiser_fwd", "degrade", "ctf",
                                  "stats_vec", "ewrec_wave"])
def test_golden(name):
    path = os.path.join(FIXTURE_DIR, f"{name}.npy")
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not generated (run: python {__file__} regen)")
    expect = np.load(path)
    got = np.asarray(_cases()[name]())
    # Degradation RNG and conv autotuning can differ in the last ulps;
    # everything else should be tight.
    tol = 2e-2 if name in ("denoiser_fwd",) else 1e-4
    np.testing.assert_allclose(got, expect, atol=tol, rtol=tol)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
        regen()
