"""Runtime setup helpers: compilation cache + kernel backend selection."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA/Mosaic compilation cache.  Essential on the target
    TPU: scatter/Mosaic compiles through the remote-compile path cost
    minutes per shape; the cache amortizes them across processes/rounds."""
    import jax

    path = path or os.environ.get(
        "MGTPU_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def configure_backend(cfg) -> None:
    """Apply cfg.kernel_backend ('xla' | 'pallas') to the spmm dispatch."""
    import jax.numpy as jnp

    from multilevel_gnn_tpu.ops import spmm

    spmm.set_backend(cfg.kernel_backend)
    spmm.set_spmm_dtype(jnp.bfloat16 if cfg.spmm_bf16 else None)
