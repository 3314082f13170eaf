"""Pretrain -> fine-tune workflow for AE / VAE / VQ-VAE.

The reference implies but does not ship this driver (checkpoint paths at
opt.py:373-378, partial loads at multilevel_gnn.py:386-394; SURVEY.md §3.4).
This module provides it as a first-class workflow:

  1. pretrain_autoencoder(): train AE/VAE/VQ-VAE on reconstruction
     (flatten decoders reconstruct the full node vector batch.x; foreach
     decoders reconstruct the PCA-row values batch.raw_data).
  2. transfer_pretrained(): copy intersecting parameter paths (node
     embedding, GNN stack, learnable PCA) into a fresh MultilevelGNN —
     the strict=False partial state-dict load of the reference.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

import flax

from multilevel_gnn_tpu.core.batch import Batch
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.data.cohort import Cohort
from multilevel_gnn_tpu.models.autoencoder import AutoEncoder, reconstruction_loss
from multilevel_gnn_tpu.models.vae import VAE, vae_loss
from multilevel_gnn_tpu.models.vq_vae import VQVAE, vqvae_loss
from multilevel_gnn_tpu.train.driver import iter_batches

log = logging.getLogger(__name__)


def _recon_target(batch: Batch, cfg: Config):
    return batch.x if cfg.decoder_type == "flatten" else batch.raw_data


def build_pretrain(
    cfg: Config,
    cohort: Cohort,
    kind: str = "autoencoder",
    fold_i: int = 0,
):
    """Build the AE/VAE/VQ-VAE pretraining state + jitted step.

    Split out of pretrain_autoencoder so tests can lower the jitted step
    (HLO scatter-free proofs) without running the epoch loop.  Returns a
    dict with model/ctx/fold/params/opt_state/step/loss pieces."""
    assert kind in ("autoencoder", "vae", "mmd_vae", "vq_vae")
    train_idx = np.arange(len(cohort.patients))
    fold = cohort.fold(train_idx, fold_i)
    cfg = cfg.replace(
        pathway_num=cohort.n_pathways,
        node_num=cohort.num_nodes // 3,
        slot_sizes=cohort.slot_sizes(),
    )
    model = {
        "autoencoder": AutoEncoder,
        "vae": VAE,
        "mmd_vae": VAE,
        "vq_vae": VQVAE,
    }[kind](cfg)
    ctx = fold.ctx

    X, Y, ages = cohort.X, cohort.Y, cohort.ages
    raw = cohort.raw_datas[
        [cohort.pca_patients.index(p) for p in cohort.patients]
    ].astype(np.float32)
    std_w = jnp.asarray(cohort.gene_std_value)

    def add_raw(b: Batch, idxs) -> Batch:
        return Batch(
            x=b.x, y=b.y, age=b.age, sample_mask=b.sample_mask,
            raw_data=jnp.asarray(raw[idxs]),
        )

    rng0 = jax.random.PRNGKey(cfg.seed)
    b0 = next(
        iter_batches(X, Y, ages, train_idx, cfg.batch_size,
                     np.random.RandomState(0), False, False)
    )
    b0 = add_raw(b0, train_idx[: cfg.batch_size])
    init_rngs = (
        {"params": rng0, "sample": rng0}
        if kind in ("vae", "mmd_vae")
        else {"params": rng0}
    )
    params = model.init(init_rngs, b0, ctx, False)
    if cfg.init_with_pca and fold.pca_seed is not None:
        from multilevel_gnn_tpu.models.multilevel_gnn import seed_pca_params

        params = seed_pca_params(params, jnp.asarray(fold.pca_seed))

    tx = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)
    opt_state = tx.init(params)

    def loss_fn(params, batch, key):
        target = _recon_target(batch, cfg)
        if kind == "autoencoder":
            recon, h = model.apply(params, batch, ctx, True,
                                   rngs={"dropout": key})
            loss = reconstruction_loss(
                recon, target, cfg,
                std_w if cfg.std_weight and cfg.decoder_type != "flatten" else None,
            )
            aux = {"recon": loss}
            if cfg.pretrain_std_loss:
                std = jnp.std(
                    h.reshape(h.shape[0], -1), axis=0, ddof=1
                )
                loss = loss - cfg.pretrain_std_coef * jnp.log(std.mean())
            return loss, aux
        if kind in ("vae", "mmd_vae"):
            out = model.apply(
                params, batch, ctx, True,
                rngs={"dropout": key, "sample": key},
            )
            d = vae_loss(out["pred_x"], target, out["z"], out["mu"],
                         out["sigma"], cfg, key)
            loss = d["loss"]
            if cfg.pretrain_std_loss:
                loss = loss + cfg.pretrain_std_coef * out["aux_losses"]["std"]
            if cfg.pretrain_corr_loss:
                loss = loss + cfg.pretrain_corr_coef * out["aux_losses"]["corr"]
            return loss, d
        out = model.apply(params, batch, ctx, True, rngs={"dropout": key})
        d = vqvae_loss(out["pred_x"], target, out["vq_loss"], cfg)
        return d["loss"], d

    def _step_inner(params, opt_state, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(_step_inner)

    @jax.jit
    def epoch_fn(params, opt_state, data, plan, step0):
        """Device-side pretraining epoch (cfg.epoch_scan, same policy as
        the main driver's train_epoch, step.py:295-309): data device
        -resident, one lax.scan over the epoch's (S, B) batch plan, ONE
        loss fetch per epoch — the per-step host loop paid a device->host
        sync + ~2 MB batch transfer per step through the tunnel."""
        Xd, Yd, Ad, Rd = data
        B = plan.shape[1]

        def body(carry, xs):
            p, o = carry
            s, idxs = xs
            b = Batch(
                x=Xd[idxs], y=Yd[idxs], age=Ad[idxs],
                sample_mask=jnp.ones(B, bool), raw_data=Rd[idxs],
            )
            key = jax.random.fold_in(rng0, step0 + s)
            p, o, loss = _step_inner(p, o, b, key)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (jnp.arange(plan.shape[0]), plan),
        )
        return params, opt_state, losses.mean()

    return dict(
        cfg=cfg, model=model, ctx=ctx, fold=fold, params=params,
        opt_state=opt_state, step=step, epoch_fn=epoch_fn, rng0=rng0,
        X=X, Y=Y, ages=ages, raw=raw, train_idx=train_idx, b0=b0,
    )


def pretrain_autoencoder(
    cfg: Config,
    cohort: Cohort,
    kind: str = "autoencoder",
    epochs: int | None = None,
    fold_i: int = 0,
):
    """Train an AE/VAE/VQ-VAE on the cohort; returns (params, model, ctx)."""
    s = build_pretrain(cfg, cohort, kind, fold_i)
    cfg = s["cfg"]
    model, ctx, fold = s["model"], s["ctx"], s["fold"]
    params, opt_state, step = s["params"], s["opt_state"], s["step"]
    rng0, X, Y, ages, raw = s["rng0"], s["X"], s["Y"], s["ages"], s["raw"]
    train_idx = s["train_idx"]
    epochs = epochs or cfg.epochs

    np_rng = np.random.RandomState(cfg.seed)
    B = cfg.batch_size
    use_scan = cfg.epoch_scan
    if use_scan:
        data = jax.device_put((
            jnp.asarray(X), jnp.asarray(Y), jnp.asarray(ages),
            jnp.asarray(raw),
        ))
    step_i = 0
    for epoch in range(1, epochs + 1):
        order = np_rng.permutation(len(train_idx))
        if use_scan:
            # same batches + fold_in stream as the per-step path
            S = len(order) // B
            plan = np.asarray(
                train_idx[order[: S * B]].reshape(S, B), np.int32
            )
            params, opt_state, mean_loss = s["epoch_fn"](
                params, opt_state, data, jnp.asarray(plan), step_i
            )
            mean_loss = float(mean_loss)
            step_i += S
        else:
            losses = []
            for off in range(0, len(order) - B + 1, B):
                idxs = train_idx[order[off: off + B]]
                b = Batch(
                    x=jnp.asarray(X[idxs]),
                    y=jnp.asarray(Y[idxs]),
                    age=jnp.asarray(ages[idxs]),
                    sample_mask=jnp.ones(len(idxs), bool),
                    raw_data=jnp.asarray(raw[idxs]),
                )
                key = jax.random.fold_in(rng0, step_i)
                params, opt_state, loss = step(params, opt_state, b, key)
                losses.append(float(loss))
                step_i += 1
            mean_loss = float(np.mean(losses))
        log.info("pretrain %s epoch %d loss %.5f", kind, epoch, mean_loss)
    return params, model, ctx, fold


def transfer_pretrained(pre_params: Dict, target_params: Dict) -> Dict:
    """Copy intersecting parameter paths (matching shapes) from pretrained
    AE/VAE params into the target model params — the reference's
    strict=False partial load (multilevel_gnn.py:386-394)."""
    src = flax.traverse_util.flatten_dict(pre_params)
    dst = flax.traverse_util.flatten_dict(target_params)
    copied = 0
    for path in dst:
        if path in src and src[path].shape == dst[path].shape:
            # copy: the training step donates its input buffers, and the
            # same pretrained leaves are re-transferred into every fold
            dst[path] = jnp.array(src[path])
            copied += 1
    log.info("transferred %d/%d parameter leaves", copied, len(dst))
    return flax.traverse_util.unflatten_dict(dst)
