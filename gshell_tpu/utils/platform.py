"""Platform selection that actually works in this container.

The axon TPU plugin registers itself ahead of the ``JAX_PLATFORMS``
environment variable, so ``JAX_PLATFORMS=cpu python script.py`` still comes
up on the TPU — and silently contends with whatever long run owns the
single shared chip.  ``apply_platform_env()`` re-applies the env var through
``jax.config`` (which the plugin cannot override); entry scripts call it
right after importing jax.  tests/conftest.py does the equivalent itself.
"""
from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
