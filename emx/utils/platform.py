"""Platform selection helper for entry points.

Some environments pre-import jax from sitecustomize before a process's
own environment variables are consulted, freezing `jax_platforms` at the
parent value. Call this first in every CLI entry point so
`JAX_PLATFORMS=cpu python -m emx...` behaves as expected.
"""

from __future__ import annotations

import os


def respect_env_platforms() -> None:
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
