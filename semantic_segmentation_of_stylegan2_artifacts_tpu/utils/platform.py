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
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persistent on-disk compilation cache (large Mosaic kernels compile
    in minutes over the remote relay compiler; recompiling them per
    process is the dominant iteration cost).  Opt out with
    ``SSA_TPU_COMP_CACHE=0``; override the location with
    ``SSA_TPU_COMP_CACHE_DIR``."""
    if os.environ.get("SSA_TPU_COMP_CACHE", "1") == "0":
        return
    import jax

    cache_dir = os.environ.get(
        "SSA_TPU_COMP_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ssa_tpu_jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
