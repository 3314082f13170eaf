"""Basic NN primitives: activations, norms, MLP.

Mirrors reference models/gcn_lib/sparse/torch_nn.py:9-75 semantics (act_layer,
norm_layer, MLP) with torch-compatible default initializers so that
fixed-parameter parity tests are exact and trained-from-scratch behavior is
distributionally equivalent.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
torch_linear_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
xavier_uniform = jax.nn.initializers.glorot_uniform()


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def act(x: jax.Array, act_type: Optional[str], neg_slope: float = 0.2) -> jax.Array:
    """reference torch_nn.py:9-24 act_layer (prelu handled in MLP as param)."""
    if act_type is None:
        return x
    a = act_type.lower()
    if a == "none":
        return x
    if a == "relu":
        return jax.nn.relu(x)
    if a == "leakyrelu":
        return jax.nn.leaky_relu(x, neg_slope)
    if a == "elu":
        return jax.nn.elu(x)
    if a == "tanh":
        return jnp.tanh(x)
    if a == "sigmoid":
        return jax.nn.sigmoid(x)
    if a == "softmax":
        return jax.nn.softmax(x, axis=-1)
    raise NotImplementedError(f"activation [{act_type}] is not found")


class BatchNorm1d(nn.Module):
    """BatchNorm over all leading axes (torch BatchNorm1d on (B*N, C)).

    dtype: optional compute dtype (mixed precision); flax computes the
    batch statistics in float32 regardless, params stay float32."""

    features: int
    momentum: float = 0.9  # torch momentum 0.1 == flax 0.9
    eps: float = 1e-5
    affine: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        y = nn.BatchNorm(
            use_running_average=not training,
            momentum=self.momentum,
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
            dtype=self.dtype,
        )(x2)
        return y.reshape(orig_shape)


class Norm(nn.Module):
    """reference torch_nn.py:27-38 norm_layer: batch / layer / instance."""

    norm_type: str
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        t = self.norm_type.lower()
        if t == "none":
            return x
        if t == "batch":
            return BatchNorm1d(self.features, dtype=self.dtype)(x, training)
        if t == "layer":
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if t == "instance":
            # InstanceNorm1d(affine=False) on (N, C): per-sample, per-channel
            # normalization is ill-defined for 2D inputs; torch normalizes
            # over the length dim. For (..., C) we normalize over last axis
            # without affine, matching LayerNorm w/o params.
            # stats in f32 even under a reduced compute dtype
            xs = x.astype(jnp.float32)
            mean = xs.mean(axis=-1, keepdims=True)
            var = xs.var(axis=-1, keepdims=True)
            return ((xs - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        raise NotImplementedError(f"norm [{self.norm_type}] is not found")


def make_norm(norm_type: Optional[str], features: int) -> Optional[Norm]:
    if norm_type is None or str(norm_type).lower() == "none":
        return None
    return Norm(norm_type, features)


class Linear(nn.Module):
    """torch-default-initialized dense layer.

    dtype: optional compute dtype (params stay float32; flax casts for the
    matmul — the standard mixed-precision policy)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[jax.nn.initializers.Initializer] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_linear_init
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=torch_bias_init(in_features),
            dtype=self.dtype,
        )(x)


class EmbedTable(nn.Module):
    """Raw embedding table, param-path compatible with flax nn.Embed
    (<name>/embedding) so checkpoints interop.  Returns the FULL (V, D)
    table instead of gathering rows: nn.Embed's jnp.take transposes to an
    XLA scatter-add on the gradient side — the op class this repo bans from
    compile paths (see tests/test_hlo_scatter_free*.py).  Callers slice /
    one-hot-matmul rows out, both of which transpose scatter-free."""

    num_embeddings: int
    features: int
    embedding_init: jax.nn.initializers.Initializer = xavier_uniform

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "embedding",
            self.embedding_init,
            (self.num_embeddings, self.features),
        )


def onehot_embed(ids: jax.Array, table: jax.Array) -> jax.Array:
    """Embedding lookup as a one-hot MXU matmul: rows = onehot(ids) @ table.
    Scatter-free in both directions (the gradient to the table is the
    transposed matmul, i.e. exactly the segment-sum of cotangents that
    torch's CUDA embedding backward computes with atomics).  Intended for
    SMALL vocabularies (pathway-edge ids, one-hot pathway nodes) where the
    (E, V) one-hot is cheap."""
    oh = jax.nn.one_hot(ids, table.shape[0], dtype=table.dtype)
    return oh @ table


class FeatureEmbeddingSum(nn.Module):
    """Sum of per-feature embedding lookups — the OGB-style Atom/Bond
    encoders (reference torch_nn.py:78-117).  feature_dims: cardinality of
    each integer feature column."""

    feature_dims: Sequence[int]
    emb_dim: int

    @nn.compact
    def __call__(self, x):
        out = 0.0
        for i, dim in enumerate(self.feature_dims):
            emb = nn.Embed(
                dim, self.emb_dim, embedding_init=xavier_uniform,
                name=f"emb_{i}",
            )
            out = out + emb(x[..., i].astype(jnp.int32))
        return out


# reference aliases (utils/data_util.py:248-347 provides the OGB dims)
AtomEncoder = FeatureEmbeddingSum
BondEncoder = FeatureEmbeddingSum


class MLP(nn.Module):
    """reference torch_nn.py:54-75 MLP.

    channels: [in, h1, ..., out]; after each Linear except (last & last_lin):
    norm -> act -> dropout.
    """

    channels: Sequence[int]
    act_type: str = "relu"
    norm_type: Optional[str] = None
    use_bias: bool = True
    drop: float = 0.0
    last_lin: bool = False
    kernel_init: Optional[jax.nn.initializers.Initializer] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        n = len(self.channels)
        for i in range(1, n):
            x = Linear(
                self.channels[i], self.use_bias,
                kernel_init=self.kernel_init, dtype=self.dtype,
            )(x)
            if i == n - 1 and self.last_lin:
                continue
            if self.norm_type is not None and str(self.norm_type).lower() != "none":
                x = Norm(
                    self.norm_type, self.channels[i], dtype=self.dtype
                )(x, training)
            if self.act_type is not None and self.act_type.lower() != "none":
                if self.act_type.lower() == "prelu":
                    slope = self.param(
                        f"prelu_{i}", lambda k, s: jnp.full(s, 0.2), (1,)
                    )
                    x = jnp.where(x >= 0, x, slope * x)
                else:
                    x = act(x, self.act_type)
            if self.drop > 0:
                x = nn.Dropout(self.drop, deterministic=not training)(x)
        return x
