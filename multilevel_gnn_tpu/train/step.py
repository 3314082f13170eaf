"""Jitted train/eval steps.

Loss formulation mirrors the reference exactly (train.py:38-68,111-125):
softmax head + BCELoss on 2-column one-hot/soft targets, with optional
per-class weights (weight_balance), per-sample weights (weighted_loss), the
feature losses added on top, optional global-norm grad clip (max_norm 20),
Adam (betas, wd) + StepLR(step, gamma).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from multilevel_gnn_tpu.core.batch import Batch, FoldContext
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.models.multilevel_gnn import get_feature_loss


@jax.custom_vjp
def bce_elementwise(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.BCELoss elementwise term, value AND gradient parity.

    Forward: -(t*clamp(log p, -100) + (1-t)*clamp(log(1-p), -100))
    (ATen binary_cross_entropy's log clamp).  Backward matches ATen
    binary_cross_entropy_backward: (p - t) / max(p*(1-p), 1e-12) — the
    denominator clamp is what keeps saturated predictions (softmax output
    exactly 0 or 1 in f32) producing LARGE-but-finite gradients.  The naive
    clip(log(p)) formulation has d/dp = clip'*(1/p) = 0*inf = NaN at p=0,
    which NaN-poisons the params the first time a logit gap exceeds ~88
    nats (measured: 13 NaN epochs in the synthetic-cohort GBM CV)."""
    logp = jnp.clip(jnp.log(pred), -100.0, None)
    log1mp = jnp.clip(jnp.log(1.0 - pred), -100.0, None)
    return -(target * logp + (1.0 - target) * log1mp)


def _bce_fwd(pred, target):
    return bce_elementwise(pred, target), (pred, target)


def _bce_bwd(res, g):
    pred, target = res
    d_pred = g * (pred - target) / jnp.maximum(pred * (1.0 - pred), 1e-12)
    # d/dt of the clamped form: log(1-p) - log(p), clamps keep it finite
    logp = jnp.clip(jnp.log(pred), -100.0, None)
    log1mp = jnp.clip(jnp.log(1.0 - pred), -100.0, None)
    d_target = g * (log1mp - logp)
    return d_pred, d_target


bce_elementwise.defvjp(_bce_fwd, _bce_bwd)


def classification_loss(
    pred: jax.Array,
    y: jax.Array,
    class_weight: Optional[jax.Array],
    sample_mask: jax.Array,
    cfg: Config,
) -> jax.Array:
    """Reference train.py:53-60 weighting variants.

    weight_balance: BCELoss(weight=w) — w indexed by output column.
    weighted_loss: per-sample weight by the sample's true class.
    """
    el = bce_elementwise(pred, y)  # (B, 2)
    m = sample_mask.astype(pred.dtype)[:, None]
    denom = jnp.maximum(m.sum() * el.shape[1], 1.0)
    if cfg.weighted_loss or cfg.batch_weighted_loss:
        cls = (y[:, 1] == 1).astype(jnp.int32)
        w = class_weight[cls][:, None]
        if cfg.batch_weighted_loss:
            w = jnp.mean(w) * jnp.ones_like(w)
        return (w * el * m).sum() / denom
    if cfg.weight_balance and class_weight is not None:
        w = class_weight[None, :]  # per-column weight, BCELoss(weight=...)
        return (w * el * m).sum() / denom
    return (el * m).sum() / denom


def smooth_cross_entropy(
    logits_or_probs: jax.Array,
    target_idx: jax.Array,
    smoothing: float = 0.2,
    from_probs: bool = True,
) -> jax.Array:
    """Label-smoothing CE (reference utils/loss.py:5-24 SmoothCrossEntropy):
    smoothed target = one_hot*(1-eps) + (1-one_hot)*eps/(n_class-1), i.e.
    the off-class mass is eps/(n-1) per class (NOT eps/n).  The reference
    takes logits through log_softmax; from_probs=True accepts an
    already-softmaxed head with a grad-safe clamped log (double-where so
    p=0 contributes value -100 and gradient 0 instead of NaN)."""
    n = logits_or_probs.shape[-1]
    if from_probs:
        p = logits_or_probs
        safe = jnp.where(p > 0, p, 1.0)
        logp = jnp.where(
            p > 0, jnp.clip(jnp.log(safe), -100.0, None), -100.0
        )
    else:
        logp = jax.nn.log_softmax(logits_or_probs)
    oh = jax.nn.one_hot(target_idx, n)
    t = oh * (1.0 - smoothing) + (1.0 - oh) * smoothing / max(n - 1, 1)
    return -(t * logp).sum(-1).mean()


def make_optimizer(
    cfg: Config, steps_per_epoch: int, name: Optional[str] = None
) -> optax.GradientTransformation:
    """Adam (+StepLR) by default — the combination the reference actually
    trains with (train.py:112-114).  The reference's custom optimizer zoo
    (utils/optim.py RAdam / PlainRAdam / AdamW-with-warmup) is exposed via
    name='radam' / 'adamw'; warmup per opt.py:379-380 flags."""
    if cfg.step > 0:
        lr = optax.exponential_decay(
            cfg.lr,
            transition_steps=cfg.step * steps_per_epoch,
            decay_rate=cfg.gamma,
            staircase=True,
        )
    else:
        lr = cfg.lr
    if cfg.warmup_epochs > 0:
        warm = optax.linear_schedule(
            cfg.warmup_lr, cfg.lr, cfg.warmup_epochs * steps_per_epoch
        )
        base = lr if cfg.step > 0 else optax.constant_schedule(cfg.lr)
        lr = optax.join_schedules(
            [warm, base if callable(base) else optax.constant_schedule(base)],
            [cfg.warmup_epochs * steps_per_epoch],
        )
    chain = []
    if cfg.clip_grad:
        chain.append(optax.clip_by_global_norm(20.0))
    name = name or "adam"
    if name == "radam":
        chain.append(optax.radam(lr, b1=cfg.beta1, b2=cfg.beta2))
        if cfg.wd > 0:
            chain.append(optax.add_decayed_weights(cfg.wd))
    elif name == "adamw":
        chain.append(
            optax.adamw(lr, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.wd)
        )
    else:
        # torch optim.Adam(weight_decay=wd) is COUPLED L2 (wd*p added to
        # the gradient before the moment updates, train.py:112), not
        # decoupled AdamW — replicate by injecting the decay term ahead
        # of the Adam transform.
        if cfg.wd > 0:
            chain.append(optax.add_decayed_weights(cfg.wd))
        chain.append(optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2))
    return optax.chain(*chain)


@dataclasses.dataclass
class TrainFns:
    train_step: Callable
    eval_step: Callable
    init_state: Callable
    # device-side epoch scan (one dispatch per EPOCH instead of per step):
    # lax.scan over an epoch_plan's stacked (take, mask, mult) arrays with
    # on-device row gathers — kills the per-step dispatch+optimizer residue
    # (~4 ms/step measured on the v5e remote tunnel, 20% of the r2 step)
    train_epoch: Callable = None
    eval_scan: Callable = None
    # whole-fold device loop (one dispatch per FOLD): scan over epochs of
    # (train-step scan + eval scan), returning per-epoch eval preds/losses
    # for host-side best-by-valid tracking — on the remote TPU tunnel each
    # epoch otherwise pays ~1-2 host round trips (~40 ms each)
    train_fold: Callable = None
    # unjitted train_fold body for fold_parallel's vmap-over-units (jitted
    # once AFTER the vmap / shard_map wrap)
    train_fold_raw: Callable = None
    # unjitted epoch-scan / eval-scan bodies: vmapped by diagnostics
    # (tools/bench_fold_decomp.py) to attribute the one-dispatch loop's
    # per-epoch cost to train-scan vs eval-scan vs loop overhead
    train_epoch_raw: Callable = None
    eval_scan_raw: Callable = None


def make_loss_fn(model, cfg: Config) -> Callable:
    """The ONE training loss builder — used by both the single-device step
    (build_train_fns) and the mesh-parallel step (parallel/mesh.py), so the
    two paths cannot diverge.  Handles every model family: extra losses
    (DiffPool link/entropy via out[2]) and the learnable-PCA feature losses
    (absent for DeeperGCN / MultiOmixGCN — aux None / no PCA leaf)."""

    def loss_fn(params, batch: Batch, ctx: FoldContext, class_weight, rng):
        out = model.apply(params, batch, ctx, True, rngs={"dropout": rng})
        pred, feat = out[0], out[1]
        extra = out[2] if len(out) > 2 else 0.0
        loss = extra + classification_loss(
            pred, batch.y, class_weight, batch.sample_mask, cfg
        )
        # feature losses only apply to the learnable-PCA model family
        # (DeeperGCN / MultiOmixGCN return aux=None; reference train.py:48-49
        # is wired for the MultilevelGNN family — SURVEY.md §3.3 note)
        pca_params = params["params"].get("learnable_pca_params")
        if pca_params is not None and feat is not None:
            loss = loss + get_feature_loss(
                pca_params, ctx, feat, cfg, batch.sample_mask
            )
        return loss, pred

    return loss_fn


def build_train_fns(model, cfg: Config) -> TrainFns:
    """Build jitted train/eval steps for a model following the uniform
    protocol apply(params, batch, ctx, training) -> (pred, aux)."""

    loss_fn = make_loss_fn(model, cfg)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, ctx, class_weight, rng):
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, ctx, class_weight, rng
        )
        updates, opt_state = _tx[0].update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, batch, ctx):
        pred = model.apply(params, batch, ctx, False)[0]
        loss = classification_loss(
            pred, batch.y, None, batch.sample_mask, cfg.replace(
                weight_balance=False, weighted_loss=False,
                batch_weighted_loss=False,
            )
        )
        return pred, loss

    def _gather_batch(data, take, mask, mult):
        xb = jnp.take(data["X"], take, axis=0)
        if mult is not None:
            xb = xb * mult
        raw = data.get("raw")
        return Batch(
            x=xb,
            y=jnp.take(data["Y"], take, axis=0),
            age=jnp.take(data["ages"], take, axis=0),
            sample_mask=mask,
            raw_data=jnp.take(raw, take, axis=0) if raw is not None else None,
        )

    def _train_epoch_raw(
        params, opt_state, data, take, mask, mult, step_idx, ctx,
        class_weight, rng0,
    ):
        """One EPOCH of train steps as a single compiled lax.scan.

        data: {"X": (n, ...), "Y", "ages"[, "raw"]} device-resident full
        arrays; take/mask (S, B) and mult (S, B, ...)|None come from
        driver.epoch_plan (host RNG), step_idx (S,) carries the global
        step counter so jax.random.fold_in(rng0, step) matches the
        per-step path bit-for-bit."""

        body = _train_step_body(data, ctx, class_weight, rng0)
        xs = (take, mask, step_idx) + ((mult,) if mult is not None else ())
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), xs
        )
        return params, opt_state, losses

    train_epoch = partial(jax.jit, donate_argnums=(0, 1))(_train_epoch_raw)

    _ecfg = cfg.replace(
        weight_balance=False, weighted_loss=False, batch_weighted_loss=False,
    )

    def _eval_scan_inner(params, data, take, mask, ctx):
        def body(_, xs):
            take_s, mask_s = xs
            batch = _gather_batch(data, take_s, mask_s, None)
            pred = model.apply(params, batch, ctx, False)[0]
            loss = classification_loss(
                pred, batch.y, None, batch.sample_mask, _ecfg
            )
            return None, (pred, loss)

        _, (preds, losses) = jax.lax.scan(body, None, (take, mask))
        return preds, losses

    @jax.jit
    def eval_scan(params, data, take, mask, ctx):
        """All of a split's (or several splits', concatenated) eval batches
        in one compiled scan: preds (S, B, 2) + per-batch losses (S,)."""
        return _eval_scan_inner(params, data, take, mask, ctx)

    def _train_step_body(data, ctx, class_weight, rng0):
        def body(carry, xs):
            p, o = carry
            take_s, mask_s, si = xs[0], xs[1], xs[2]
            mult_s = xs[3] if len(xs) > 3 else None
            batch = _gather_batch(data, take_s, mask_s, mult_s)
            rng = jax.random.fold_in(rng0, si)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, ctx, class_weight, rng
            )
            updates, o = _tx[0].update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss

        return body

    def train_fold_raw(
        params, opt_state, data, take, mask, step_idx, n_epochs, ev_take,
        ev_mask, ctx, class_weight, rng0,
    ):
        """A WHOLE fold's training as one compiled program: a fori_loop
        over epochs of (step scan + eval scan).  take/mask (EPb, S, B),
        step_idx (EPb, S) are padded to an EPOCH BUCKET (driver) while
        n_epochs (dynamic scalar) bounds the loop — so protocols with
        different epoch counts share one executable (a fresh epoch-static
        program cost a cold pathological remote compile per protocol,
        measured ~10-20 min on the v5e tunnel).  ev_take/ev_mask (Se, B)
        fixed eval plans (valid+test concatenated).  Returns final
        (params, opt_state) and per-epoch eval preds (EPb, Se, B, 2) +
        losses (EPb, Se) — rows >= n_epochs stay zero — for host-side
        best-by-valid tracking: ONE host round trip per fold.  No
        variation-aug support (the (EP, S, B, F) multiplier would not
        fit); the driver falls back to the per-epoch path there."""
        step_body = _train_step_body(data, ctx, class_weight, rng0)
        EPb, Se, B = take.shape[0], ev_take.shape[0], ev_take.shape[1]
        n_cls = 2
        preds0 = jnp.zeros((EPb, Se, B, n_cls), jnp.float32)
        losses0 = jnp.zeros((EPb, Se), jnp.float32)

        def epoch_body(e, carry):
            p, o, preds, losses = carry
            xs = (
                jax.lax.dynamic_index_in_dim(take, e, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(mask, e, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(step_idx, e, 0, keepdims=False),
            )
            (p, o), _ = jax.lax.scan(step_body, (p, o), xs)
            p_e, l_e = _eval_scan_inner(p, data, ev_take, ev_mask, ctx)
            preds = jax.lax.dynamic_update_index_in_dim(
                preds, p_e.astype(jnp.float32), e, 0
            )
            losses = jax.lax.dynamic_update_index_in_dim(
                losses, l_e.astype(jnp.float32), e, 0
            )
            return (p, o, preds, losses)

        params, opt_state, preds, losses = jax.lax.fori_loop(
            0, n_epochs, epoch_body, (params, opt_state, preds0, losses0)
        )
        return params, opt_state, preds, losses

    # the raw (unjitted) body is exposed so fold_parallel can vmap it over
    # a stacked unit axis (and shard_map the vmap) before jitting ONCE
    train_fold = partial(jax.jit, donate_argnums=(0, 1))(train_fold_raw)

    _tx = [None]

    # jitted: eager flax init dispatches thousands of small ops, which on
    # the remote-tunnel TPU backend each pay a round trip (measured: 68 s
    # of the synthetic-CV fold-0 prep); as one compiled program it also
    # lands in the persistent compilation cache across processes
    _jit_init = jax.jit(lambda rng, batch, ctx: model.init(rng, batch, ctx, False))

    _jit_opt_init = [None]

    def init_state(rng, batch, ctx, steps_per_epoch):
        params = _jit_init(rng, batch, ctx)
        _tx[0] = make_optimizer(cfg, steps_per_epoch)
        if _jit_opt_init[0] is None:
            _jit_opt_init[0] = jax.jit(_tx[0].init)
        opt_state = _jit_opt_init[0](params)
        return params, opt_state

    return TrainFns(
        train_step, eval_step, init_state, train_epoch, eval_scan,
        train_fold, train_fold_raw, _train_epoch_raw, _eval_scan_inner,
    )
