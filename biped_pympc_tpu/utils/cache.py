"""Persistent compilation cache helper.

Cold-compile costs on the v5e runtime (round-2/3 measurements, BENCH.md
"Compile time"): the shipped foot-split Pallas kernels take 13-23 s each;
a full program that chains assembly + kernel + postprocess into scans
(`bench.py`) costs minutes of XLA work on its first-ever run (~300 s
measured cold in round 2 — the kernel is a minority of that; see the
BENCH.md breakdown). The JAX persistent cache brings every repeat-process
compile down to seconds (measured 330 s -> 16 s, including through a
remote-compile tunnel), which is the practical answer to the reference's
3-hour-per-variant compile problem: first build of a variant costs minutes
once, then it is cached on disk.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the JAX persistent compilation cache (idempotent).

    Defaults to `<repo>/.jax_cache` so benches and examples share warm
    kernels across processes and rounds.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax versions
        pass
    return cache_dir
