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
    """Apply cfg.kernel_backend ('xla' | 'pallas') to the spmm dispatch.

    Off-TPU, a configured 'pallas' backend falls back to 'xla': Mosaic
    kernels only run interpreted there (correct but orders of magnitude
    slower), and the shipped configs default to pallas for the TPU path."""
    import logging

    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.ops import spmm

    backend = cfg.kernel_backend
    if backend == "pallas" and jax.default_backend() not in ("tpu", "axon"):
        logging.getLogger(__name__).info(
            "kernel_backend=pallas requested off-TPU (%s): using xla",
            jax.default_backend(),
        )
        backend = "xla"
    spmm.set_backend(backend)
    spmm.set_spmm_dtype(
        jnp.bfloat16 if (cfg.spmm_bf16 and backend == "pallas") else None
    )
