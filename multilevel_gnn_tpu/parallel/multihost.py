"""Multi-host process-group setup (SURVEY.md §5.8).

The reference has no distributed layer; here multi-host runs use JAX's
standard recipe: jax.distributed.initialize() on every host, then one global
Mesh over jax.devices() — collectives ride ICI within a slice and DCN
across slices.  Failure model matches the reference's scope (SURVEY §5.3):
barrier at init + checkpoint-restart, no elastic membership.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_collectives: Optional[str] = None,
) -> dict:
    """Initialize the JAX process group (no-op on single-host).

    With no args, relies on the cluster environment auto-detection
    (TPU pods set the coordinator automatically).  cpu_collectives
    ('gloo' / 'mpi') selects the CPU cross-process collective backend —
    required for the multi-process CPU loopback tests (SURVEY §4.5); TPU
    pods ignore it (collectives ride ICI/DCN natively)."""
    if cpu_collectives:
        jax.config.update(
            "jax_cpu_collectives_implementation", cpu_collectives
        )
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_mesh(n_model: int = 1):
    """('data', 'model') mesh over all global devices: model-parallel edge
    partitioning stays within a host (ICI) by putting 'model' on the
    fastest-varying device axis; 'data' spans hosts (DCN-friendly — only
    gradient all-reduce crosses hosts)."""
    from multilevel_gnn_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    assert n % n_model == 0, (n, n_model)
    return make_mesh(n // n_model, n_model)
