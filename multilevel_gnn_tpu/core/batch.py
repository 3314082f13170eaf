"""Batch and per-fold context pytrees.

The reference moves per-fold derived state (MI info mask, PCA seeds, pca
match indices, reorder permutation) into model attributes via setters
(train.py:292-301).  Functionally, in JAX, that state is data: it rides in a
``FoldContext`` pytree passed to ``apply`` alongside the per-step ``Batch``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multilevel_gnn_tpu.core.graph import Graph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Batch:
    """One training/eval batch of patients on the shared fold topology.

    x:   (B, NODES) raw omics scalar per node slot (gene x omics flattened
         [g0_mrna, g0_cnv, g0_mt, g1_mrna, ...], reference multiloader
         __getitem__ x.reshape(-1,1)).
    y:   (B, 2) one-hot or soft labels (col 0 = high risk / short survival).
    age: (B,) patient age (raw, concatenated to the head input).
    sample_mask: (B,) bool — False on padding rows of a ragged last batch.
    raw_data: (B, G) optional mean-centered per-PCA-row values (PathCNN /
         AE targets; reference multiloader.py:437).
    """

    x: jax.Array
    y: jax.Array
    age: jax.Array
    sample_mask: jax.Array
    raw_data: Optional[jax.Array] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FoldContext:
    """Per-fold derived constants shared by every batch.

    graph:          fold topology (self-looped variant built by the model
                    owner for SAGE/GAT-style convs).
    gene_pca_match: (G,) int32 node slot per PCA row, -1 = missing
                    (reference multiloader.py:613-616).
    raw_indice:     (G,) int32 pathway-slot id per PCA row in [0, 3*146)
                    (reference multiloader.py:438).
    info_mask:      (G, 1) float32 MI selection mask (reference
                    multilevel_gnn.py:350-351 set_info_mask).
    reorder_idxs:   (146,) int32 pathway display permutation (identity when
                    reorder_pathway is off).
    pca_seed:       optional (G, pca_dim) float32 sklearn-PCA-seeded initial
                    value for the learnable PCA params (set_pca_params).
    """

    graph: Graph
    gene_pca_match: jax.Array
    raw_indice: jax.Array
    info_mask: jax.Array
    reorder_idxs: jax.Array
    pca_seed: Optional[jax.Array] = None
    # SortedSegments over gene_pca_match (resolved to node slots) — enables
    # the scatter-free Pallas backward of the gene->PCA-row gather
    pca_gather_seg: Optional[object] = None
    # second topology for edge_type='merge' (reference multilevel_gnn.py
    # :156-182 edge-list mode: PPI + GRN graphs, features concatenated)
    graph2: Optional[Graph] = None
    # (P, P) pathway correlation + I adjacency for DiffPool heads
    # (reference vae.py:301-306 set_pathway_similarity_matrix)
    pathway_adj: Optional[jax.Array] = None

    @property
    def num_pca_rows(self) -> int:
        return int(self.gene_pca_match.shape[0])


def make_fold_context(
    graph: Graph,
    gene_pca_match: np.ndarray,
    raw_indice: np.ndarray,
    info_mask: Optional[np.ndarray] = None,
    reorder_idxs: Optional[np.ndarray] = None,
    pca_seed: Optional[np.ndarray] = None,
    n_pathways: int = 146,
) -> FoldContext:
    from multilevel_gnn_tpu.ops.pallas.segment_sum import SortedSegments

    g = np.asarray(gene_pca_match, np.int32)
    if info_mask is None:
        info_mask = np.ones((len(g), 1), np.float32)
    info_mask = np.asarray(info_mask, np.float32).reshape(len(g), 1)
    if reorder_idxs is None:
        reorder_idxs = np.arange(n_pathways, dtype=np.int32)
    # torch negative-index semantics: -1 resolves to the last node slot
    resolved = np.where(g >= 0, g, graph.n_nodes + g)
    return FoldContext(
        graph=graph,
        gene_pca_match=jnp.asarray(g),
        raw_indice=jnp.asarray(np.asarray(raw_indice, np.int32)),
        info_mask=jnp.asarray(info_mask),
        reorder_idxs=jnp.asarray(np.asarray(reorder_idxs, np.int32)),
        pca_seed=jnp.asarray(np.asarray(pca_seed, np.float32))
        if pca_seed is not None
        else None,
        pca_gather_seg=SortedSegments.build(resolved, graph.n_nodes),
    )
