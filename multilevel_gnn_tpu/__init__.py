"""multilevel_gnn_tpu — a TPU-native GNN framework (JAX / XLA / Pallas / pjit).

A from-scratch, TPU-first framework with the full capabilities of the
Y-Claw/Multilevel-GNN reference (survival/risk classification on TCGA
multi-omics cancer cohorts): sparse message-passing convolutions, DeeperGCN
generalized aggregation, DiffPool soft-assignment coarsening, the hierarchical
multilevel-GNN pipeline (learnable per-pathway PCA contraction + PathCNN conv
head), AutoEncoder/VAE/VQ-VAE pretraining, mutual-information feature/edge
selection, and the 5-fold stratified-CV experiment protocol.

Design principles (TPU-first, not a port):
  * Fixed graph topology per CV fold => one shared edge list, features batched
    with a leading batch dim (B, N, C).  No PyG-style block-diagonal batching.
  * All neighborhood aggregation is expressed as gather + segment-reduce over
    a destination-sorted static edge list; hot paths have fused Pallas
    kernels, with jax.ops.segment_* XLA fallbacks as correctness oracles.
  * Multi-chip scaling via jax.sharding.Mesh + shard_map: batch sharded on the
    'data' axis, edges partitioned on the 'model' axis with psum combination.
"""

__version__ = "0.1.0"

from multilevel_gnn_tpu.core.graph import Graph  # noqa: F401
