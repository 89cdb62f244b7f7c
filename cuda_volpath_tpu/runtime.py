"""Process-level JAX runtime configuration shared by the entry points.

Two settings every launcher (CLI, viewer, bench, tools) wants before the
first backend touch:

* honor ``JAX_PLATFORMS`` even under backend plugins whose import hook
  probes their device transport regardless of the env var (the remote-TPU
  tunnel does) — pinning the platform in-process lets e.g.
  ``JAX_PLATFORMS=cpu`` render on the host while a benchmark owns the
  single-owner TPU tunnel;
* the persistent XLA compile cache in ``.cache/xla``: wavefront launch
  graphs take minutes to compile (remote TPU ~2-4 min, XLA-CPU more), and
  they are static per (RenderSettings, resolution, pool) — a warm cache
  makes every repeat render/viewer session start in seconds.

The reference has no equivalent concern (nvcc compiles ahead of time); this
is the TPU-native counterpart of shipping prebuilt kernels.
"""

from __future__ import annotations

import os
from pathlib import Path

_CACHE_DIR = Path(__file__).parent.parent / ".cache" / "xla"


def configure_jax(cache_dir: str | os.PathLike | None = None) -> None:
    """Apply process-level config; call before the first jax device use."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      str(cache_dir or _CACHE_DIR))
