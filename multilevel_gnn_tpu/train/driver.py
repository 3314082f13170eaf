"""Experiment driver: runs x 5-fold stratified CV with check-epoch pooled
scoring (reference train.py:111-382).

Protocol reproduced:
  * outer StratifiedKFold(5) for tune/test, inner StratifiedKFold(5) first
    split for train/valid (train.py:258-280)
  * per fold: MI mask -> PCA recompute -> seeded PCA params -> edge
    re-selection (train.py:290-301) — all via Cohort.fold()
  * per epoch: train, then eval on train/valid/test; best-by-valid-AUC and
    best-by-valid-loss test snapshots; snapshots recorded at check-epochs
    (every 5) (train.py:144-206)
  * cross-fold pooled AUC/ACC per check-epoch, aggregated over runs
    (train.py:338-376)

TPU-first deltas: one jitted step per fold with static shapes (edge counts
padded to buckets so folds share compilations), batched fixed-topology
graphs, optional device mesh sharding (parallel/).
"""
from __future__ import annotations

import dataclasses
import logging
import math
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multilevel_gnn_tpu.core.batch import Batch
from multilevel_gnn_tpu.core.config import Config
from multilevel_gnn_tpu.data.cohort import Cohort
from multilevel_gnn_tpu.models import get_model
from multilevel_gnn_tpu.models.multilevel_gnn import seed_pca_params
from multilevel_gnn_tpu.train import metrics as M
from multilevel_gnn_tpu.train.step import build_train_fns

log = logging.getLogger(__name__)


def stratified_kfold(labels: np.ndarray, n_splits: int, shuffle: bool, seed):
    """StratifiedKFold split indices (sklearn-compatible protocol)."""
    from sklearn.model_selection import StratifiedKFold

    skf = StratifiedKFold(
        n_splits=n_splits,
        shuffle=shuffle,
        random_state=seed if shuffle else None,
    )
    idx = np.arange(len(labels))
    return list(skf.split(idx, labels))


def epoch_bucket(n_epochs: int) -> int:
    """Geometric (+~50%, floor 8) bucket for train_fold's padded epoch
    axis: the whole-fold program is shape-static in the epoch dimension,
    so padding to a shared bucket lets protocols with different epoch
    counts (10-epoch benches, 70-epoch published protocols) reuse ONE
    compiled executable — a fresh epoch-static program costs a cold remote
    compile per protocol on the v5e tunnel.  The dynamic n_epochs scalar
    bounds the fori_loop; padding rows are never executed."""
    epb = 8
    while epb < n_epochs:
        epb += max(8, epb // 2)
    return epb


def epoch_plan(
    X, idxs, batch_size, rng: np.random.RandomState,
    shuffle: bool, drop_last: bool,
    sampler_weights: Optional[np.ndarray] = None,
    variation_aug: Optional[dict] = None,
):
    """Host-side batch PLAN for one epoch: the index selection and
    augmentation-multiplier draws of the reference DataLoader setups
    (train.py:309-327, multiloader.py:876-884), decoupled from batch
    materialization so the device-side epoch scan (train/step.py
    train_epoch) can gather rows on-device from the same plan.

    Yields (take (B,) int, sample_mask (B,) bool, mult (B, *feat) | None).
    The np RNG consumption order is EXACTLY iter_batches' historical order
    (selection draw, then per-batch rand(B) + uniform(shape)), so plans
    and materialized iterators are interchangeable mid-stream.

    variation_aug: {prob, range} — with probability prob, multiply features
    by U(1-range, 1+range); cnv slots (slot % 3 == 1) exempt."""
    idxs = np.asarray(idxs)
    if sampler_weights is not None:
        # WeightedRandomSampler(weights, num_samples, replacement=True)
        num_samples = batch_size * math.ceil(len(idxs) / batch_size)
        p = sampler_weights / sampler_weights.sum()
        order = rng.choice(len(idxs), size=num_samples, replace=True, p=p)
        sel = idxs[order]
    elif shuffle:
        sel = idxs[rng.permutation(len(idxs))]
    else:
        sel = idxs
    n = len(sel)
    stop = (n // batch_size) * batch_size if drop_last else n
    for s in range(0, stop, batch_size):
        chunk = sel[s : s + batch_size]
        b = len(chunk)
        pad = batch_size - b
        take = np.concatenate([chunk, np.repeat(chunk[-1:], pad)]) if pad else chunk
        mult = None
        if variation_aug is not None:
            shape = (len(take),) + X.shape[1:]
            mult = np.ones(shape, X.dtype)
            hit = rng.rand(len(take)) < variation_aug["prob"]
            r = variation_aug["range"]
            noise = rng.uniform(1 - r, 1 + r, shape).astype(X.dtype)
            if X.ndim == 2:
                noise[:, 1::3] = 1.0  # cnv slots exempt (reference :880)
            else:
                noise[..., 1] = 1.0  # gene-level layout: cnv column
            mult[hit] = noise[hit]
        yield (
            take,
            np.concatenate([np.ones(b, bool), np.zeros(pad, bool)]),
            mult,
        )


def iter_batches(
    X, Y, ages, idxs, batch_size, rng: np.random.RandomState,
    shuffle: bool, drop_last: bool,
    sampler_weights: Optional[np.ndarray] = None,
    variation_aug: Optional[dict] = None,
    raw: Optional[np.ndarray] = None,
):
    """Batch iterator mirroring the reference DataLoader setups
    (train.py:309-327). Yields fully-padded Batch pytrees.  The per-step
    dispatch path; the epoch-scan path consumes epoch_plan directly."""
    for take, mask, mult in epoch_plan(
        X, idxs, batch_size, rng, shuffle, drop_last, sampler_weights,
        variation_aug,
    ):
        xb = X[take]
        if mult is not None:
            xb = xb * mult
        yield Batch(
            x=jnp.asarray(xb),
            y=jnp.asarray(Y[take]),
            age=jnp.asarray(ages[take]),
            sample_mask=jnp.asarray(mask),
            raw_data=jnp.asarray(raw[take]) if raw is not None else None,
        )


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class FoldResult:
    y_true: np.ndarray
    epoch_pred: Dict[int, np.ndarray]
    epoch_pred_by_loss: Dict[int, np.ndarray]
    epoch_pred_by_epoch: Dict[int, np.ndarray]
    # wall-clock seconds per (train + eval) epoch; first entry includes
    # compilation — consumers (bench.py) take the median
    epoch_times: List[float] = dataclasses.field(default_factory=list)


def evaluate(fns, params, ctx, X, Y, ages, idxs, batch_size, raw=None,
             mesh=None):
    preds, losses = [], []
    rng = np.random.RandomState(0)
    for batch in iter_batches(
        X, Y, ages, idxs, batch_size, rng, shuffle=False, drop_last=False,
        raw=raw,
    ):
        if mesh is not None:
            from multilevel_gnn_tpu.parallel import shard_batch

            batch = shard_batch(batch, mesh)
        pred, loss = fns.eval_step(params, batch, ctx)
        m = np.asarray(batch.sample_mask)
        preds.append(np.asarray(pred)[m])
        losses.append(float(loss))
    pred = np.concatenate(preds)
    auc, acc, y_true, score0 = M.eval_scores(Y[idxs], pred)
    return auc, acc, y_true, score0, float(np.mean(losses))


_FNS_CACHE: Dict = {}


def _shared_fns(cfg: Config, cohort: Cohort, steps_per_epoch: int):
    """One model + one set of jitted steps per (config, steps_per_epoch) —
    folds and runs share compilations (fold shapes are identical thanks to
    edge bucketing; steps_per_epoch keys the baked-in LR schedule).
    cfg.node_num must already be set for the model family (run_fold)."""
    model_cfg = cfg.replace(pathway_num=cohort.n_pathways)
    key = (id(cohort), repr(model_cfg), steps_per_epoch)
    if key not in _FNS_CACHE:
        model = get_model(cfg.model)(model_cfg)
        _FNS_CACHE[key] = (model, build_train_fns(model, model_cfg))
        if len(_FNS_CACHE) > 4:
            _FNS_CACHE.pop(next(iter(_FNS_CACHE)))
    return _FNS_CACHE[key]


def fold_setup(cfg: Config, cohort: Cohort, train_idx, fold_i: int):
    """Per-fold data derivation shared by training (run_fold) and offline
    prediction (train/predict.py): fold recompute (MI masks / PCA / edges),
    model-family node features, and the raw-data side channel.

    Returns (cfg, fold, X, raw) with cfg's node counts filled in."""
    gene_level = cfg.model in ("deepergcn",)
    if gene_level:
        # DeeperGCN rides the gene-level topology with pathway-vnode edges
        # and per-pathway PCA attrs in batch.raw_data
        fold = cohort.deepergcn_fold(np.asarray(train_idx), fold_i)
        X = cohort.gene_level_features()
        raw = fold.pathway_node_attr.astype(np.float32)
        cfg = cfg.replace(
            pathway_edge_num=max(getattr(cohort, "pathway_edge_num", 0), 1),
            node_num=cohort.node_size + cohort.n_pathways,
        )
    else:
        fold = cohort.fold(np.asarray(train_idx), fold_i)
        cfg = cfg.replace(node_num=cohort.num_nodes // 3)
        X = cohort.X
        raw = (
            fold.pathway_node_attr.astype(np.float32)
            if cfg.model == "pathcnn" and not cfg.learnable_pca
            else (
                cohort.raw_datas[
                    [cohort.pca_patients.index(p) for p in cohort.patients]
                ].astype(np.float32)
                if cfg.model == "pathcnn"
                else None
            )
        )
        if cfg.model == "pathcnn" and not cfg.learnable_pca:
            raw = raw.reshape(len(cohort.patients), -1)
    return cfg, fold, X, raw


def run_fold(
    cfg: Config,
    cohort: Cohort,
    train_idx,
    valid_idx,
    test_idx,
    fold_i: int,
    run_i: int,
    check_epochs: List[int],
    pretrained_params=None,
    mesh=None,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    interrupt_after: Optional[int] = None,
    prepared=None,
    warm_only: bool = False,
) -> FoldResult:
    """warm_only=True: AOT-compile (jit .lower().compile()) every
    executable this fold would run — into the persistent compilation
    cache — WITHOUT executing a step, then return None.  The pre-flight
    for cold processes on the remote-compile TPU tunnel (mgtpu-warm,
    train/warm.py): first-call windows of 200-560 s collapse to cache
    hits.  Geometric shape buckets mean fold 0's executables serve all
    folds."""
    t_prep0 = time.time()
    _marks: List = []

    def _mark(label):
        _marks.append((label, time.time()))

    # prepared: a (cfg, fold, X, raw) tuple from fold_setup — run_experiment
    # caches these across runs (every run re-derives IDENTICAL splits, so
    # the reference recomputes the same MI mask + PCA + edge re-selection
    # num_run times, train.py:258-299) and prefetches the next fold's on a
    # background thread while this fold trains on-device.
    cfg, fold, X, raw = (
        prepared if prepared is not None
        else fold_setup(cfg, cohort, train_idx, fold_i)
    )
    _mark("cohort.fold")
    ctx = fold.ctx
    if mesh is not None:
        from multilevel_gnn_tpu.parallel import shard_ctx

        assert cfg.batch_size % mesh.shape["data"] == 0, (
            cfg.batch_size, dict(mesh.shape),
        )
        ctx = shard_ctx(ctx, mesh)
        from multilevel_gnn_tpu.ops import spmm as _spmm

        if cfg.halo_exchange and mesh.shape["model"] > 1:
            # boundary-only halo exchange (§5.7): partition built from the
            # shard-padded graph so edge_sel indexes the padded edge array
            import dataclasses as _dc

            from multilevel_gnn_tpu.parallel.halo import build_halo_partition

            hp = build_halo_partition(
                ctx.graph, mesh.shape["model"],
                pallas=_spmm.get_backend() == "pallas",
                # per-shard windowed interior kernels (the single-chip
                # winner); window ranges are ownership-local by construction
                windowed=cfg.windowed_spmm
                and _spmm.get_backend() == "pallas",
            )
            ctx = _dc.replace(ctx, graph=_dc.replace(ctx.graph, halo=hp))
            _spmm.set_parallel_mesh(mesh)
        else:
            _spmm.set_parallel_mesh(None)

    Y, ages = cohort.Y, cohort.ages
    steps_per_epoch = max(len(train_idx) // cfg.batch_size, 1)
    model, fns = _shared_fns(cfg, cohort, steps_per_epoch)
    _mark("build_fns")
    rng_key = jax.random.PRNGKey(cfg.seed * 10_000 + run_i * 100 + fold_i)
    init_batch = next(
        iter_batches(
            X, Y, ages, train_idx, cfg.batch_size, np.random.RandomState(0),
            False, False, raw=raw,
        )
    )
    params, opt_state = fns.init_state(rng_key, init_batch, ctx, steps_per_epoch)
    jax.block_until_ready(params)
    _mark("init_state")
    if cfg.model == "deepergcn" and (cfg.all_init or cfg.head_init):
        # reference init_weight / head-only xavier re-init at construction
        # (deepergcn.py:169-175); all_init defaults on like the reference
        from multilevel_gnn_tpu.models.deepergcn import apply_init_weight

        params = apply_init_weight(
            params, jax.random.fold_in(rng_key, 7), head_only=not cfg.all_init
        )
    if cfg.init_with_pca and fold.pca_seed is not None:
        params = seed_pca_params(params, jnp.asarray(fold.pca_seed))
    if pretrained_params is not None:
        # AE/VAE-pretrained partial load (reference load_autoencoder_pretrain,
        # multilevel_gnn.py:386-394) — applied AFTER the PCA seeding so the
        # pretrained learnable-PCA weights win, as in the reference
        from multilevel_gnn_tpu.train.pretrain import transfer_pretrained

        params = transfer_pretrained(pretrained_params, params)

    if mesh is not None:
        from multilevel_gnn_tpu.parallel import replicate

        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)

    class_weight = jnp.asarray(fold.class_weight, jnp.float32)
    if mesh is not None:
        from multilevel_gnn_tpu.parallel import replicate

        class_weight = replicate(class_weight, mesh)
    sampler_weights = None
    if cfg.class_sample:
        labels = cohort.labels()[np.asarray(train_idx)]
        sampler_weights = fold.class_weight[labels]

    np_rng = np.random.RandomState(cfg.seed + 1000 * run_i + fold_i)
    results = {
        "highest_valid": -1.0,
        "highest_valid_loss": 100.0,
        "result_y": None,
        "result_y_by_loss": None,
        "epoch": {},
        "epoch_by_loss": {},
        "epoch_by_epoch": {},
    }
    y_true_test = None
    shuffle = not cfg.class_sample
    drop_last = not (
        cfg.class_sample or cfg.weighted_loss or cfg.batch_weighted_loss
    )
    variation = (
        {"prob": cfg.random_variation_prob, "range": cfg.random_range}
        if cfg.random_variation_aug
        else None
    )
    step_i = 0
    start_epoch = 1
    fold_tag = f"run{run_i}_fold{fold_i}"
    if ckpt_dir is not None and resume:
        from multilevel_gnn_tpu.train import checkpoint as C

        tag_dir = os.path.join(ckpt_dir, fold_tag)
        last = C.latest_resumable_step(tag_dir)
        if last is not None:
            tree, _ = C.load_checkpoint(
                tag_dir, {"params": params, "opt_state": opt_state}, last
            )
            params, opt_state = tree["params"], tree["opt_state"]
            host = C.load_host_state(tag_dir, last)
            results = host["results"]
            y_true_test = host["y_true_test"]
            step_i = host["step_i"]
            np_rng.set_state(host["np_rng_state"])
            start_epoch = last + 1
            log.info("resumed %s at epoch %d", fold_tag, last)

    _parts, _last = [], t_prep0
    for label, t in _marks:
        _parts.append(f"{label} {t - _last:.2f}s")
        _last = t
    log.info(
        "run %d fold %d: host prep+init %.2fs (%s)", run_i, fold_i,
        time.time() - t_prep0, ", ".join(_parts),
    )
    # ---- device-side epoch scan (cfg.epoch_scan, single-device path) ----
    # one compiled dispatch per train epoch + one per eval pass instead of
    # one per step; semantics-identical (same epoch_plan host RNG, same
    # fold_in(rng_key, step) stream) — tests/test_epoch_scan.py
    use_scan = (
        bool(cfg.epoch_scan) and mesh is None and fns.train_epoch is not None
    )
    if use_scan:
        dev_data = {
            "X": jnp.asarray(X),
            "Y": jnp.asarray(Y),
            "ages": jnp.asarray(ages),
        }
        if raw is not None:
            dev_data["raw"] = jnp.asarray(raw)

        def _eval_plan(idx):
            plan = list(
                epoch_plan(
                    X, idx, cfg.batch_size, np.random.RandomState(0),
                    False, False,
                )
            )
            take = np.stack([p[0] for p in plan]).astype(np.int32)
            m = np.stack([p[1] for p in plan])
            return jnp.asarray(take), jnp.asarray(m), len(plan)

        # valid + test share ONE scan per epoch (fixed, shuffle-free plans)
        vtake, vmask, n_v = _eval_plan(valid_idx)
        ttake, tmask, n_t = _eval_plan(test_idx)
        ev_take = jnp.concatenate([vtake, ttake])
        ev_mask = jnp.concatenate([vmask, tmask])
        ev_mask_h = np.asarray(ev_mask)

        def _scan_eval(params):
            preds, losses = fns.eval_scan(
                params, dev_data, ev_take, ev_mask, ctx
            )
            preds, losses = np.asarray(preds), np.asarray(losses)
            out = []
            for idx, s, e in (
                (valid_idx, 0, n_v), (test_idx, n_v, n_v + n_t),
            ):
                p = preds[s:e][ev_mask_h[s:e]]
                auc, acc, y_true, score0 = M.eval_scores(Y[np.asarray(idx)], p)
                out.append(
                    (auc, acc, y_true, score0, float(losses[s:e].mean()))
                )
            return out

    def _record_epoch(
        epoch, valid_auc, valid_acc, valid_loss, test_score
    ):
        """Best-by-valid tracking + check-epoch snapshots (reference
        train.py:144-206) — shared by the per-epoch and whole-fold paths."""
        valid_eval = valid_auc if cfg.metrics == "auc" else valid_acc
        if valid_loss < results["highest_valid_loss"]:
            results["highest_valid_loss"] = valid_loss
            results["result_y_by_loss"] = test_score
        if valid_eval > results["highest_valid"]:
            results["highest_valid"] = valid_eval
            results["result_y"] = test_score
        if epoch in check_epochs:
            # fallback to the current epoch's predictions if no valid-set
            # improvement was ever recorded (e.g. degenerate tiny valid set)
            results["epoch"][epoch] = (
                results["result_y"]
                if results["result_y"] is not None
                else test_score
            )
            results["epoch_by_loss"][epoch] = (
                results["result_y_by_loss"]
                if results["result_y_by_loss"] is not None
                else test_score
            )
            results["epoch_by_epoch"][epoch] = test_score

    def _save_fold_ckpt(epoch):
        """Checkpoint {params, opt_state} + host loop state at ``epoch``.

        Called per-epoch on the step path (cfg.ckpt_every cadence) and ONCE
        per completed fold on the fold-scan path — enabling checkpointing no
        longer forfeits the scan (VERDICT r3 #5): the scan returns the final
        params in hand, so a crash loses at most one fold and resume
        restarts at the next (run, fold) via the experiment-level
        result_run*_fold*.npy records (reference ckpt_util.py:9-24 + the
        commented-out per-epoch save in train.py:193-196)."""
        from multilevel_gnn_tpu.train import checkpoint as C

        tag_dir = os.path.join(ckpt_dir, fold_tag)
        C.save_checkpoint(
            tag_dir, params, opt_state,
            loop_state={"run": run_i, "fold": fold_i, "epoch": epoch},
            step=epoch,
        )
        C.save_host_state(
            tag_dir, epoch,
            {
                "results": results,
                "y_true_test": y_true_test,
                "step_i": step_i,
                "np_rng_state": np_rng.get_state(),
            },
        )
        C.prune_old_steps(tag_dir, cfg.ckpt_keep)

    # ---- whole-fold device loop: ONE dispatch + ONE host fetch per fold
    # (train/step.py:train_fold).  Engaged when nothing needs per-epoch
    # host control: no PER-EPOCH checkpoint cadence (cfg.ckpt_every>0 —
    # fold-BOUNDARY checkpoints ride the scan path itself, see
    # _save_fold_ckpt), no interrupt hook, no variation aug
    # (its (EP, S, B, F) multiplier would not fit), fresh fold.
    # static steps/epoch (epoch_plan yield count): sampler draws
    # B*ceil(n/B) with replacement; otherwise drop_last truncates.  Zero
    # steps (drop_last and n_train < batch_size) means there is nothing
    # to stack/scan — the per-epoch path below handles it (`if plan:`).
    n_tr = len(np.asarray(train_idx))
    if sampler_weights is not None or not drop_last:
        steps_per_epoch = math.ceil(n_tr / cfg.batch_size)
    else:
        steps_per_epoch = n_tr // cfg.batch_size
    use_fold_scan = (
        use_scan
        and cfg.fold_scan
        and fns.train_fold is not None
        and (ckpt_dir is None or cfg.ckpt_every <= 0)
        and interrupt_after is None
        and variation is None
        and start_epoch == 1
        and cfg.epochs >= 1
        and steps_per_epoch >= 1
    )
    epoch_times: List[float] = []
    if use_fold_scan:
        t_fold0 = time.time()
        takes, masks, sidxs = [], [], []
        for epoch in range(1, cfg.epochs + 1):
            plan = list(
                epoch_plan(
                    X, train_idx, cfg.batch_size, np_rng, shuffle, drop_last,
                    sampler_weights, None,
                )
            )
            takes.append(np.stack([p[0] for p in plan]).astype(np.int32))
            masks.append(np.stack([p[1] for p in plan]))
            sidxs.append(
                np.arange(step_i, step_i + len(plan), dtype=np.int32)
            )
            step_i += len(plan)
        # pad the epoch axis to a GEOMETRIC bucket: train_fold bounds the
        # loop with the dynamic n_epochs scalar, so protocols with
        # different epoch counts share one compiled executable (padding
        # rows are never executed)
        epb = epoch_bucket(cfg.epochs)
        for _ in range(epb - cfg.epochs):
            takes.append(np.zeros_like(takes[0]))
            masks.append(np.zeros_like(masks[0]))
            sidxs.append(np.zeros_like(sidxs[0]))
        fold_args = (
            params, opt_state, dev_data, jnp.asarray(np.stack(takes)),
            jnp.asarray(np.stack(masks)), jnp.asarray(np.stack(sidxs)),
            jnp.asarray(cfg.epochs, jnp.int32),
            ev_take, ev_mask, ctx, class_weight, rng_key,
        )
        if warm_only:
            fns.train_fold.lower(*fold_args).compile()
            log.info("warm: train_fold compiled (fold-scan path)")
            return None
        params, opt_state, preds, losses = fns.train_fold(*fold_args)
        preds_h, losses_h = np.asarray(preds), np.asarray(losses)
        per_epoch = (time.time() - t_fold0) / max(cfg.epochs, 1)
        for epoch in range(1, cfg.epochs + 1):
            ep = epoch - 1
            out = []
            for idx, s, e in (
                (valid_idx, 0, n_v), (test_idx, n_v, n_v + n_t),
            ):
                p = preds_h[ep, s:e][ev_mask_h[s:e]]
                auc, acc, y_true, score0 = M.eval_scores(Y[np.asarray(idx)], p)
                out.append(
                    (auc, acc, y_true, score0,
                     float(losses_h[ep, s:e].mean()))
                )
            (valid_auc, valid_acc, _, _, valid_loss) = out[0]
            (test_auc, _, y_true_test, test_score, _) = out[1]
            _record_epoch(epoch, valid_auc, valid_acc, valid_loss, test_score)
            epoch_times.append(per_epoch)
            log.info(
                "run %d fold %d epoch %d: valid auc %.4f test auc %.4f "
                "loss %.4f (fold-scan, %.3fs/epoch amortized)",
                run_i, fold_i, epoch, valid_auc, test_auc, valid_loss,
                per_epoch,
            )
        if ckpt_dir is not None:
            # fold-boundary durability: one save per fold keeps the
            # ~0.01 s/epoch scan speed (vs 6x slower per-epoch stepping)
            _save_fold_ckpt(cfg.epochs)
        return FoldResult(
            y_true=y_true_test,
            epoch_pred={e: results["epoch"][e] for e in check_epochs},
            epoch_pred_by_loss={
                e: results["epoch_by_loss"][e] for e in check_epochs
            },
            epoch_pred_by_epoch={
                e: results["epoch_by_epoch"][e] for e in check_epochs
            },
            epoch_times=epoch_times,
        )

    if warm_only:
        if use_scan:
            plan = list(
                epoch_plan(
                    X, train_idx, cfg.batch_size, np_rng, shuffle, drop_last,
                    sampler_weights, variation,
                )
            )
            if plan:
                take = np.stack([p[0] for p in plan]).astype(np.int32)
                maskp = np.stack([p[1] for p in plan])
                mult = (
                    jnp.asarray(np.stack([p[2] for p in plan]))
                    if variation is not None
                    else None
                )
                sidx = np.arange(len(plan), dtype=np.int32)
                fns.train_epoch.lower(
                    params, opt_state, dev_data, jnp.asarray(take),
                    jnp.asarray(maskp), mult, jnp.asarray(sidx), ctx,
                    class_weight, rng_key,
                ).compile()
            fns.eval_scan.lower(
                params, dev_data, ev_take, ev_mask, ctx
            ).compile()
            log.info("warm: train_epoch + eval_scan compiled")
        else:
            batch = init_batch
            if mesh is not None:
                from multilevel_gnn_tpu.parallel import shard_batch

                batch = shard_batch(batch, mesh)
            fns.train_step.lower(
                params, opt_state, batch, ctx, class_weight, rng_key
            ).compile()
            fns.eval_step.lower(params, batch, ctx).compile()
            log.info("warm: train_step + eval_step compiled")
        return None

    for epoch in range(start_epoch, cfg.epochs + 1):
        epoch_t0 = time.time()
        if use_scan:
            plan = list(
                epoch_plan(
                    X, train_idx, cfg.batch_size, np_rng, shuffle, drop_last,
                    sampler_weights, variation,
                )
            )
            if plan:
                take = np.stack([p[0] for p in plan]).astype(np.int32)
                maskp = np.stack([p[1] for p in plan])
                mult = (
                    jnp.asarray(np.stack([p[2] for p in plan]))
                    if variation is not None
                    else None
                )
                sidx = np.arange(step_i, step_i + len(plan), dtype=np.int32)
                params, opt_state, _ = fns.train_epoch(
                    params, opt_state, dev_data, jnp.asarray(take),
                    jnp.asarray(maskp), mult, jnp.asarray(sidx), ctx,
                    class_weight, rng_key,
                )
                step_i += len(plan)
        else:
            for batch in iter_batches(
                X, Y, ages, train_idx, cfg.batch_size, np_rng, shuffle,
                drop_last, sampler_weights, variation, raw=raw,
            ):
                if mesh is not None:
                    from multilevel_gnn_tpu.parallel import shard_batch

                    batch = shard_batch(batch, mesh)
                step_rng = jax.random.fold_in(rng_key, step_i)
                params, opt_state, loss = fns.train_step(
                    params, opt_state, batch, ctx, class_weight, step_rng
                )
                step_i += 1

        if use_scan:
            (
                (valid_auc, valid_acc, _, _, valid_loss),
                (test_auc, test_acc, y_true_test, test_score, test_loss),
            ) = _scan_eval(params)
        else:
            valid_auc, valid_acc, _, _, valid_loss = evaluate(
                fns, params, ctx, X, Y, ages, valid_idx, cfg.batch_size,
                raw=raw, mesh=mesh,
            )
            test_auc, test_acc, y_true_test, test_score, test_loss = evaluate(
                fns, params, ctx, X, Y, ages, test_idx, cfg.batch_size,
                raw=raw, mesh=mesh,
            )
        _record_epoch(epoch, valid_auc, valid_acc, valid_loss, test_score)
        epoch_times.append(time.time() - epoch_t0)
        log.info(
            "run %d fold %d epoch %d: valid auc %.4f test auc %.4f loss %.4f"
            " (%.2fs)",
            run_i, fold_i, epoch, valid_auc, test_auc, valid_loss,
            epoch_times[-1],
        )
        want_interrupt = interrupt_after is not None and interrupt_after[0] == 1
        if ckpt_dir is not None and (
            (cfg.ckpt_every > 0 and epoch % cfg.ckpt_every == 0)
            or want_interrupt
            or (cfg.ckpt_every <= 0 and epoch == cfg.epochs)
        ):
            _save_fold_ckpt(epoch)
        if interrupt_after is not None:
            interrupt_after[0] -= 1
            if interrupt_after[0] <= 0:
                raise KeyboardInterrupt(
                    f"interrupted at {fold_tag} epoch {epoch} (test hook)"
                )

    return FoldResult(
        y_true=y_true_test,
        epoch_pred={e: results["epoch"][e] for e in check_epochs},
        epoch_pred_by_loss={e: results["epoch_by_loss"][e] for e in check_epochs},
        epoch_pred_by_epoch={e: results["epoch_by_epoch"][e] for e in check_epochs},
        epoch_times=epoch_times,
    )


class _DaemonPrefetcher:
    """1-worker prefetch executor on a DAEMON thread.

    concurrent.futures' ThreadPoolExecutor registers an atexit hook that
    joins its (non-daemon) workers, so a KeyboardInterrupt mid-experiment
    would hang interpreter exit for the duration of an in-flight MI/PCA
    fold derivation.  A daemon worker dies with the process instead; the
    submit/result surface mirrors the executor subset the driver uses."""

    class _Future:
        def __init__(self, ev, box):
            self._ev, self._box = ev, box

        def result(self):
            self._ev.wait()
            if "e" in self._box:
                raise self._box["e"]
            return self._box["r"]

    def __init__(self):
        import queue
        import threading

        self._q = queue.Queue()
        self._t = threading.Thread(
            target=self._run, daemon=True, name="fold-prefetch"
        )
        self._t.start()

    def submit(self, fn, *args):
        import threading

        ev, box = threading.Event(), {}
        self._q.put((fn, args, ev, box))
        return self._Future(ev, box)

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args, ev, box = item
            try:
                box["r"] = fn(*args)
            except BaseException as e:  # surfaced via Future.result
                box["e"] = e
            ev.set()

    def shutdown(self, wait=False, cancel_futures=True):
        self._q.put(None)


def run_experiment(
    cfg: Config, cohort: Cohort, pretrained_params=None,
    pretrain: Optional[str] = None, pretrain_epochs: Optional[int] = None,
    ckpt_dir: Optional[str] = None, resume: bool = False,
    interrupt_after: Optional[list] = None,
) -> Dict:
    """Full num_run x 5-fold protocol with pooled check-epoch scoring.

    pretrain: 'autoencoder' | 'vae' | 'vq_vae' — run reconstruction
    pretraining on the cohort first and transfer the encoder into every
    fold's init (the reference's load_autoencoder_ckpt workflow).

    ckpt_dir: orbax checkpoints of {params, opt_state} plus host loop
    state per (run, fold); completed folds persist their FoldResult.
    cfg.ckpt_every=0 (default) checkpoints at FOLD boundaries, keeping the
    whole-fold device scan engaged; ckpt_every>0 checkpoints every N
    epochs for mid-fold resume (disengages the fold scan — ~6x slower
    epochs, see core/config.py).  resume=True restarts an interrupted
    experiment deterministically: completed folds are loaded from disk,
    a mid-fold interrupted fold resumes at its last checkpointed epoch
    with the exact numpy RNG state (reference utils/ckpt_util.py:9-104
    role, SURVEY.md §5.3/5.4).  interrupt_after=[n] is a test hook: raise
    KeyboardInterrupt after n epochs of training (counted across folds)."""
    from multilevel_gnn_tpu.parallel.mesh import maybe_make_mesh

    mesh = maybe_make_mesh(cfg)
    if pretrain is not None and pretrained_params is None:
        from multilevel_gnn_tpu.train.pretrain import pretrain_autoencoder

        pretrained_params, _, _, _ = pretrain_autoencoder(
            cfg.replace(slot_sizes=cohort.slot_sizes()),
            cohort, pretrain, epochs=pretrain_epochs,
        )
    labels = cohort.labels()
    check_epochs = list(range(5, cfg.epochs + 1, 5)) or [cfg.epochs]
    agg = {
        k: {e: [] for e in check_epochs}
        for k in ("auc", "auc_by_loss", "auc_by_epoch", "acc", "acc_by_loss",
                  "acc_by_epoch")
    }
    t0 = time.time()

    # ---- fold-setup cache + prefetch ----
    # Every run derives IDENTICAL splits (stratified_kfold is seeded by
    # cfg.split_seed alone), so the per-fold host derivation (MI mask,
    # per-pathway PCA, edge re-selection, graph metadata) is the same for
    # run 2..num_run — the reference recomputes it every run
    # (train.py:258-299).  Cache the 5 FoldData by (fold_i, train_idx) and
    # overlap the FIRST run's derivations with on-device training via a
    # 1-worker thread (fold_setup is pure host work on the cohort;
    # training only reads cohort.X/Y/ages).
    def _fold_indices(outer, fold_i):
        tune, test_idx = outer[fold_i]
        inner = stratified_kfold(
            labels[tune], 5, cfg.split_shaffle, cfg.split_seed
        )
        tr, va = inner[0]
        return tune[tr], tune[va], test_idx

    setup_cache: Dict = {}
    pending: Dict = {}
    executor = _DaemonPrefetcher() if cfg.fold_prefetch else None

    def _setup_key(fold_i, train_idx):
        return (fold_i, np.asarray(train_idx).tobytes())

    def _get_setup(fold_i, train_idx):
        k = _setup_key(fold_i, train_idx)
        if k not in setup_cache:
            fut = pending.pop(k, None)
            setup_cache[k] = (
                fut.result() if fut is not None
                else fold_setup(cfg, cohort, train_idx, fold_i)
            )
        return setup_cache[k]

    def _prefetch(fold_i, train_idx):
        if executor is None:
            return
        k = _setup_key(fold_i, train_idx)
        if k not in setup_cache and k not in pending:
            pending[k] = executor.submit(
                fold_setup, cfg, cohort, train_idx, fold_i
            )

    try:
        for run_i in range(cfg.num_run):
            outer = stratified_kfold(
                labels, 5, cfg.split_shaffle, cfg.split_seed
            )
            fold_results: List[FoldResult] = []
            for fold_i in range(len(outer)):
                train_idx, valid_idx, test_idx = _fold_indices(outer, fold_i)
                done_path = (
                    os.path.join(
                        ckpt_dir, f"result_run{run_i}_fold{fold_i}.npy"
                    )
                    if ckpt_dir is not None
                    else None
                )
                if (
                    resume and done_path is not None
                    and os.path.exists(done_path)
                ):
                    fr = np.load(done_path, allow_pickle=True).item()
                    log.info(
                        "run %d fold %d: loaded completed result",
                        run_i, fold_i,
                    )
                    # a resumed run skipping this fold still prefetches the
                    # NEXT fold's derivation so the first fold that does
                    # train keeps the setup/compute overlap
                    if fold_i + 1 < len(outer):
                        nxt, _, _ = _fold_indices(outer, fold_i + 1)
                        _prefetch(fold_i + 1, nxt)
                else:
                    prepared = _get_setup(fold_i, train_idx)
                    if fold_i + 1 < len(outer):
                        nxt, _, _ = _fold_indices(outer, fold_i + 1)
                        _prefetch(fold_i + 1, nxt)
                    fr = run_fold(
                        cfg, cohort, train_idx, valid_idx, test_idx, fold_i,
                        run_i, check_epochs, pretrained_params, mesh=mesh,
                        ckpt_dir=ckpt_dir, resume=resume,
                        interrupt_after=interrupt_after, prepared=prepared,
                    )
                    if done_path is not None:
                        os.makedirs(ckpt_dir, exist_ok=True)
                        np.save(done_path, fr, allow_pickle=True)
                fold_results.append(fr)
            y = np.concatenate([fr.y_true for fr in fold_results])
            for e in check_epochs:
                for key, attr in (
                    ("auc", "epoch_pred"),
                    ("auc_by_loss", "epoch_pred_by_loss"),
                    ("auc_by_epoch", "epoch_pred_by_epoch"),
                ):
                    pred = np.concatenate(
                        [getattr(fr, attr)[e] for fr in fold_results]
                    )
                    agg[key][e].append(M.roc_auc(y, pred))
                    agg[key.replace("auc", "acc")][e].append(
                        M.accuracy(y, pred > 0.5)
                    )
            log.info(
                "run %d: pooled AUC@%d %.4f", run_i, check_epochs[-1],
                agg["auc"][check_epochs[-1]][-1],
            )
    finally:
        if executor is not None:
            executor.shutdown(wait=False, cancel_futures=True)
    all_epoch_times = [
        t
        for fr in fold_results
        for t in getattr(fr, "epoch_times", [])  # absent in pre-r2 pickles
    ]
    out = {
        "check_epochs": check_epochs,
        "wall_time_s": time.time() - t0,
        # median excludes the compile-heavy first epochs of each fold
        "epoch_s_median": float(np.median(all_epoch_times))
        if all_epoch_times
        else None,
    }
    for k, d in agg.items():
        out[k] = {e: float(np.mean(v)) for e, v in d.items()}
        out[k + "_std"] = {e: float(np.std(v)) for e, v in d.items()}
        out[k + "_all"] = {e: list(map(float, v)) for e, v in d.items()}
    return out
