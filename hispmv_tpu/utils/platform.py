"""Platform selection helpers.

The axon TPU-relay plugin (when present) force-overrides jax's
``jax_platforms`` config at import time, which silently ignores a user's
``JAX_PLATFORMS`` environment choice.  Entry points call
:func:`honor_platform_env` to restore the env var's authority.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
