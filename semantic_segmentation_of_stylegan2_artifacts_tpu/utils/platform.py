"""Platform selection helper.

Some environments register TPU PJRT plugins that win over the
``JAX_PLATFORMS`` env var; the jax config knob still takes priority.
``SSA_TPU_PLATFORM=cpu python train.py …`` forces the platform reliably
(used by the hermetic CLI tests).
"""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    plat = os.environ.get("SSA_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
