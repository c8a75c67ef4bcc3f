"""Platform selection that survives plugin overrides.

Some TPU attachment plugins (installed via PYTHONPATH site hooks) override
the JAX_PLATFORMS environment variable during import, so exporting
``JAX_PLATFORMS=cpu`` for a subprocess silently still lands on the TPU.
Calling ``jax.config.update("jax_platforms", ...)`` from Python is
authoritative; this helper re-applies the user's env choice before any
backend initializes. Trainers/CLIs call it first thing in main().
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Re-apply JAX_PLATFORMS from the environment via jax.config.

    No-op when the variable is unset or a backend is already initialized
    (in which case jax.config.update raises and we keep whatever came up).
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
