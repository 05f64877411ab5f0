"""EWREC reconstruction throughput: GS iterations/sec on the reference
budget (512^2 crops, ~15 focal slices, 50 iterations —
misc_py/ewrec_class.py:481-513,651-666).

Usage: python -m emx.bench.ewrec_bench [n_slices] [side]
Prints one JSON line {"metric": "ewrec_iters_per_s", ...}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from emx.recon.ewrec import EWRECConfig, _ctf_stack


def measure(n_slices: int = 15, side: int = 512, num_iter: int = 50) -> dict:
    cfg = EWRECConfig(wavelength=0.025, num_iter=num_iter)
    rng = np.random.default_rng(0)
    amps = jnp.asarray(rng.random((n_slices, side, side)), jnp.float32)
    defocuses = jnp.asarray(np.linspace(-700, 700, n_slices), jnp.float32)

    @jax.jit
    def run(a, dfs):
        # Build complex CTF stacks INSIDE the jit: complex arrays must not
        # cross the host boundary on tunneled backends.
        to_focus = _ctf_stack(dfs, side, cfg.wavelength, cfg.px_dim, -1.0)
        to_plane = _ctf_stack(dfs, side, cfg.wavelength, cfg.px_dim, +1.0)

        def body(_, psi):
            ew = jnp.mean(jnp.fft.ifft2(jnp.fft.fft2(psi) * to_focus), axis=0)
            back = jnp.fft.ifft2(jnp.fft.fft2(ew)[None] * to_plane)
            return back * (a / jnp.maximum(jnp.abs(back), 1e-12))

        psi = jax.lax.fori_loop(0, num_iter, body, a.astype(jnp.complex64))
        return jnp.sum(jnp.abs(psi))

    float(run(amps, defocuses))  # compile + roundtrip
    n_calls = 5
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(n_calls):
        acc += float(run(amps, defocuses))
    dt = time.perf_counter() - t0
    iters_per_s = num_iter * n_calls / dt
    return {
        "metric": "ewrec_iters_per_s",
        "value": round(iters_per_s, 2),
        "unit": f"GS iters/s ({n_slices}x{side}^2)",
        "full_reconstructions_per_s": round(n_calls / dt, 3),
    }


def main(n_slices: int = 15, side: int = 512, num_iter: int = 50) -> None:
    print(json.dumps(measure(n_slices, side, num_iter)))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
