"""Persistent compilation cache — the serving answer to Mosaic cold
compiles.

The time-varying SOS kernel's Mosaic compile costs 100-300 s at
production shapes (measured across fresh processes,
logs/r5_onchip/r5_tv_compile_probe.log: plain 305 s, fori-chained
108-284 s — the spread is remote-compile service variance, the floor is
the kernel body itself; the round-4 "415 s" was one draw from this
distribution, not a wrapper multiplier). A persistent cache drops the
SECOND process's first call to 38.9 s at the same config (same log) —
trace + cache load + tunnel transfer; the Mosaic work is never repeated.

Serving processes should call :func:`enable_persistent_cache` before
first compile (or set ``JAX_COMPILATION_CACHE_DIR``, which recent JAX
reads natively).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax


def enable_persistent_cache(
    cache_dir: str | os.PathLike | None = None,
    *,
    min_compile_secs: float = 1.0,
) -> Path:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    ``cache_dir`` defaults to ``$JAX_COMPILATION_CACHE_DIR`` or
    ``~/.cache/digital_signal_processsing_tpu/xla``. Returns the resolved
    path. Call BEFORE the first jit compile of the process.
    """
    path = Path(
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or Path.home() / ".cache" / "digital_signal_processsing_tpu" / "xla"
    )
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return path


__all__ = ["enable_persistent_cache"]
