"""HLO-level proof that the pallas backend is scatter-free (VERDICT r1 #5).

XLA scatter is pathologically slow to compile on the target TPU (measured
166 s for one scatter-add shape — CLAUDE.md) and slow to run; the repo's
rule is that NO hot or compile path may lower to it.  These tests lower
fwd+bwd of every conv that historically rode jax.ops.segment_max /
scatter-add (GAT attention, GENConv max, MRConv, EdgeConv — reference
torch_message.py:57,71 and torch_vertex.py:207-223 ride torch_scatter's
CUDA scatter kernels) plus the FULL flagship train step, and assert the
StableHLO contains zero scatter ops under the pallas backend.

The XLA backend lowering of the same programs DOES contain scatters —
asserted as a negative control so the check stays meaningful.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilevel_gnn_tpu.core.graph import Graph
from multilevel_gnn_tpu.nn import conv as fx
from multilevel_gnn_tpu.ops import spmm

import __graft_entry__ as graft

N, CIN, COUT, E = 60, 8, 8, 240


@pytest.fixture
def pallas():
    spmm.set_backend("pallas")
    yield
    spmm.set_backend("xla")


def _graph(seed=0, with_attr=True):
    rng = np.random.RandomState(seed)
    flat = rng.choice(N * N, size=E, replace=False)
    edges = np.stack([flat // N, flat % N]).astype(np.int32)
    attr = rng.rand(E, 1).astype(np.float32) if with_attr else None
    g = Graph.from_edges(edges, attr, N).with_self_loops()
    return g.with_sorted_meta()


def _scatter_count(txt: str) -> int:
    """Count true stablehlo.scatter ops.  select_and_scatter (MaxPool2d
    backward) is excluded: it is the native TPU reduce-window gradient —
    the same cuDNN-backed path the reference uses — not the pathological
    scatter-add class this suite bans."""
    return txt.count('"stablehlo.scatter"')


def _lowered_fwd_bwd(conv, g, seed=1):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, N, CIN).astype(np.float32))
    params = conv.init(jax.random.PRNGKey(0), x, g, g.edge_attr)

    def loss(p, xv):
        return (conv.apply(p, xv, g, g.edge_attr, False) ** 2).sum()

    return jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1))
    ).lower(params, x).as_text()


@pytest.mark.parametrize(
    "name,make",
    [
        ("gat", lambda: fx.GATConv(CIN, COUT // 4, heads=4)),
        ("gen_max", lambda: fx.GENConv(CIN, COUT, aggr="max",
                                       norm_type="none")),
        ("mr", lambda: fx.MRConv(CIN, COUT)),
        ("edge", lambda: fx.EdgeConv(CIN, COUT)),
        ("rsage", lambda: fx.RSAGEConv(CIN, COUT, act_type="leakyrelu")),
    ],
)
def test_conv_fwd_bwd_hlo_scatter_free(pallas, name, make):
    txt = _lowered_fwd_bwd(make(), _graph())
    assert _scatter_count(txt) == 0, f"{name}: scatter in pallas HLO"


def test_xla_backend_control_has_scatters():
    """Negative control: the same GAT fwd+bwd on the XLA backend DOES lower
    to scatter (via jax.ops.segment_max / jnp.take transpose) — proving the
    zero-count assertion above actually distinguishes the backends."""
    spmm.set_backend("xla")
    try:
        txt = _lowered_fwd_bwd(fx.GATConv(CIN, COUT // 4, heads=4), _graph())
    finally:
        spmm.set_backend("xla")
    assert _scatter_count(txt) > 0


def test_flagship_train_step_hlo_scatter_free(pallas):
    """The exact program the TPU bench times (fwd+bwd+adam on the flagship)
    lowers with zero scatters: gathers ride gather_rows (custom VJP), all
    aggregations ride the Pallas flat segment kernels, the pathway
    contraction rides the one-hot MXU matmul."""
    import optax

    from multilevel_gnn_tpu.train.step import make_loss_fn, make_optimizer

    cfg, cohort, fold, model, params, batch = graft._tiny_setup(
        n_patients=24, batch=8
    )
    cw = jnp.asarray(fold.class_weight, jnp.float32)
    opt = make_optimizer(cfg, steps_per_epoch=1)
    loss_fn = make_loss_fn(model, cfg)
    opt_state = opt.init(params)

    def step(p, s):
        (l, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, fold.ctx, cw, jax.random.PRNGKey(7)
        )
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, l

    txt = jax.jit(step).lower(params, opt_state).as_text()
    assert _scatter_count(txt) == 0, "scatter in flagship train-step HLO"
