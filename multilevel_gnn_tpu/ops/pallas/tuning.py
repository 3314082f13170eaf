"""Backend-fingerprint-keyed kernel tuning table (VERDICT r4 Next #4).

The remote TPU backend's codegen drifts across service builds: the same
Pallas program measured 3.65e8 edges/s (f32 flat segment-sum, te=256) on
the r1/r2 build and 2.79e8 on build cl/831091709, where te=128 recovers
to 3.19e8 (tools/retune_flat.py sweep, STATUS r4s2b; same speed in every
MXU precision mode, so the drift is memory/layout-side codegen — not our
kernel).  A framework claiming TPU-first should pick tile sizes from the
*measured* backend build, not ask users to read a comment and set an env
var.

This table maps a backend build fingerprint (a substring of
``jax.devices()[0].client.platform_version``) to tuned kernel params.
Lookup order for the edge-chunk tile ``te``:

  1. ``MGTPU_TE`` env var (explicit user override always wins),
  2. the first table row whose key appears in the platform_version,
  3. the default (te=256, the value every CPU test and unknown backend
     uses — keeps test expectations and cache keys stable off-TPU).

Refresh protocol: run ``tools/retune_flat.py`` once per round on the live
backend; if the best te changed, add/update the row for that build string
here.  The bench captures ``backend_env.platform_version`` + codegen
hashes in every artifact, so rows are auditable against BENCH_r*.json.

No reference counterpart: torch_scatter ships fixed CUDA launch configs
(reference models/gcn_lib/sparse/torch_message.py:57,71); this subsystem
exists because our kernel substrate outlives backend service builds.
"""
from __future__ import annotations

import os
from typing import Optional

# backend build fingerprint (substring of platform_version) -> params.
# Measured 2026-08-20 (tools/retune_flat.py, v5e): on cl/831091709 the
# f32 flat kernel runs 3.19e8 edges/s at te=128 vs 2.79e8 at te=256
# (+14%); the bf16 kernel and the full shipped cohort step are
# te-insensitive (7.0-7.1e8 / 31.5 ms either way), so te=128 is safe
# globally on this build.  Windowed tile tc deliberately has NO row: the
# kernel-only tc=2048 win (5.24 vs 5.63 ms) made the FULL step slower
# (33.6 vs 31.75 ms — transpose/backward tile interaction, commit
# c8e6755), so the plan heuristic stands.
_TABLE = {
    "cl/831091709": {"te": 128},
}

_DEFAULT_TE = 256

_fingerprint_cache: Optional[str] = None


def backend_fingerprint() -> str:
    """The backend's platform_version string ('' off-TPU / on error).
    Cached per process: device lookup can touch the remote tunnel."""
    global _fingerprint_cache
    if _fingerprint_cache is None:
        try:
            import jax

            d = jax.devices()[0]
            _fingerprint_cache = str(d.client.platform_version)
        except Exception:
            _fingerprint_cache = ""
    return _fingerprint_cache


def tuned_te() -> int:
    """Edge-chunk tile for the flat segment-sum layout (see table doc)."""
    env = os.environ.get("MGTPU_TE")
    if env:
        return int(env)
    fp = backend_fingerprint()
    if fp:
        for key, params in _TABLE.items():
            if key in fp and "te" in params:
                return int(params["te"])
    return _DEFAULT_TE
