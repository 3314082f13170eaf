"""Segment reductions with torch_scatter-compatible semantics.

These are the XLA reference implementations of the kernel surface the
reference delegates to torch_scatter CUDA (reference:
models/gcn_lib/sparse/torch_message.py:4 ``scatter, scatter_softmax``;
utils/pyg_util.py:4-35 sentinel handling).  Hot paths are overridden by
Pallas kernels in ``multilevel_gnn_tpu.ops.pallas``; these XLA versions are
the correctness oracles and the CPU/test backend.

Conventions
-----------
* ``data`` has the segment (edge) axis at position ``axis`` (default -2), so
  batched edge messages are shaped (B, E, C) and node outputs (B, S, C).
* Empty segments produce 0 for sum/mean/max/min — matching torch_scatter's
  zero-fill and the reference's +-10000 sentinel wrapper
  (utils/pyg_util.py:30-33).
* ``mask`` marks padding edges (False => ignored).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _move_to_front(data: jax.Array, axis: int):
    axis = axis % data.ndim
    return jnp.moveaxis(data, axis, 0), axis


def _apply_mask(data, segment_ids, num_segments, mask, fill=0.0):
    """Route masked-out elements to a trash segment and fill their data."""
    if mask is None:
        return data, segment_ids, num_segments, False
    seg = jnp.where(mask, segment_ids, num_segments)
    shape = (-1,) + (1,) * (data.ndim - 1)
    data = jnp.where(mask.reshape(shape), data, fill)
    return data, seg, num_segments + 1, True


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    axis: int = -2,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    data, axis = _move_to_front(data, axis)
    data, seg, n, trashed = _apply_mask(data, segment_ids, num_segments, mask)
    out = jax.ops.segment_sum(data, seg, n, indices_are_sorted=False)
    if trashed:
        out = out[:num_segments]
    return jnp.moveaxis(out, 0, axis)


def segment_count(
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    ones = jnp.ones(segment_ids.shape, dtype)
    return segment_sum(ones[:, None], segment_ids, num_segments, axis=0, mask=mask)[
        :, 0
    ]


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    axis: int = -2,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    total = segment_sum(data, segment_ids, num_segments, axis, mask)
    count = segment_count(segment_ids, num_segments, mask)
    axis_ = axis % total.ndim
    shape = [1] * total.ndim
    shape[axis_] = num_segments
    count = jnp.clip(count, 1.0, None).reshape(shape)
    return total / count


def _segment_extreme(data, segment_ids, num_segments, axis, mask, kind):
    data, axis = _move_to_front(data, axis)
    neutral = -jnp.inf if kind == "max" else jnp.inf
    data, seg, n, trashed = _apply_mask(
        data, segment_ids, num_segments, mask, fill=neutral
    )
    fn = jax.ops.segment_max if kind == "max" else jax.ops.segment_min
    out = fn(data, seg, n, indices_are_sorted=False)
    if trashed:
        out = out[:num_segments]
    # empty segments -> 0, matching the reference sentinel wrapper
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    return jnp.moveaxis(out, 0, axis)


def segment_max(data, segment_ids, num_segments, axis: int = -2, mask=None):
    return _segment_extreme(data, segment_ids, num_segments, axis, mask, "max")


def segment_min(data, segment_ids, num_segments, axis: int = -2, mask=None):
    return _segment_extreme(data, segment_ids, num_segments, axis, mask, "min")


def segment_softmax(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    axis: int = -2,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-(segment, feature) softmax over the segment axis.

    Matches torch_scatter.scatter_softmax (max-subtracted, per feature
    column), the core of GENConv softmax aggregation (reference:
    torch_message.py:49-65).  Padding elements get weight 0; all-padding
    segments are guarded against 0/0.
    """
    data, axis = _move_to_front(data, axis)
    if mask is not None:
        shape = (-1,) + (1,) * (data.ndim - 1)
        data = jnp.where(mask.reshape(shape), data, -jnp.inf)
    seg_max = jax.ops.segment_max(data, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = data - seg_max[segment_ids]
    expv = jnp.exp(shifted)
    if mask is not None:
        shape = (-1,) + (1,) * (data.ndim - 1)
        expv = jnp.where(mask.reshape(shape), expv, 0.0)
    denom = jax.ops.segment_sum(expv, segment_ids, num_segments)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    out = expv / denom[segment_ids]
    return jnp.moveaxis(out, 0, axis)
