"""Serialized-inference export (train/export.py): the StableHLO artifact
reproduces the live model bit-for-bit and rehydrates without any
framework model/data code (only the npz leaves + jax.export)."""
import json

import numpy as np

from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
from multilevel_gnn_tpu.train.export import (
    export_fold,
    load_exported,
    save_exported,
)
from multilevel_gnn_tpu.train.predict import load_fold_state, predict_fold

from test_predict import _tiny_cfg


def test_export_roundtrip_matches_live_model(tmp_path):
    from multilevel_gnn_tpu.train.driver import run_experiment

    cfg = _tiny_cfg()
    cohort = make_synthetic_cohort(cfg, seed=0, n_patients=50, n_pathways=5)
    ckpt = str(tmp_path / "ckpt")
    run_experiment(cfg, cohort, ckpt_dir=ckpt)

    ex = export_fold(cfg, cohort, ckpt, run_i=0, fold_i=0)
    out = str(tmp_path / "export")
    save_exported(out, ex)

    infer = load_exported(out)
    assert infer.meta["batch_size"] == cfg.batch_size
    assert infer.meta["n_leaves"] == len(ex["leaves"])

    # the artifact reproduces the checkpointed model's test-split
    # probabilities (predict_fold is the live-model oracle)
    res = predict_fold(cfg, cohort, ckpt, run_i=0, fold_i=0, split="test")
    st = load_fold_state(cfg, cohort, ckpt, run_i=0, fold_i=0)
    idx = np.asarray(st["splits"]["test"])
    B = cfg.batch_size
    X = np.asarray(st["X"])
    probs = []
    for lo in range(0, len(idx), B):
        part = idx[lo:lo + B]
        pad = np.concatenate([part, np.repeat(part[-1:], B - len(part))])
        p = np.asarray(infer(X[pad], np.asarray(cohort.ages)[pad]))
        probs.append(p[: len(part)])
    probs = np.concatenate(probs)
    # predict's "prob" is pred[:, 0] of the softmax head (metrics.
    # eval_scores, reference train.py:103-109 convention)
    np.testing.assert_allclose(
        probs[:, 0], np.asarray(res["prob"]), rtol=1e-5, atol=1e-6,
    )


def test_export_windowed_bf16_trunk_roundtrip(tmp_path):
    """The SHIPPED config stack — pallas kernels (interpret on CPU) +
    windowed SpMM + bf16 messages + bf16 compute trunk — exports and
    rehydrates prediction-equal to the live model (VERDICT r4 Next #6;
    the v5e Mosaic-custom-call variant is the bench export_eval arm)."""
    import jax.numpy as jnp

    from multilevel_gnn_tpu.core.batch import Batch
    from multilevel_gnn_tpu.ops import spmm

    cfg = _tiny_cfg().replace(
        kernel_backend="pallas", windowed_spmm=True, windowed_min_edges=1,
        compute_dtype="bfloat16", spmm_bf16=True,
    )
    cohort = make_synthetic_cohort(cfg, seed=3, n_patients=50, n_pathways=5)
    spmm.set_backend("pallas")
    spmm.set_spmm_dtype(jnp.bfloat16)
    try:
        st = load_fold_state(cfg, cohort, None)  # PRNGKey(0) params
        # the fold graph must actually carry a windowed plan (else this
        # test silently degrades to the composed path)
        assert st["ctx"].graph.winplan is not None
        ex = export_fold(cfg, cohort, None, params=st["params"])
        out = str(tmp_path / "export")
        save_exported(out, ex)
        infer = load_exported(out)

        B = cfg.batch_size
        X = np.asarray(st["X"])
        idx = np.arange(B)
        b = Batch(
            x=jnp.asarray(X[idx]), y=jnp.zeros((B, 2), jnp.float32),
            age=jnp.asarray(np.asarray(cohort.ages)[idx]),
            sample_mask=jnp.ones(B, bool),
        )
        live = np.asarray(st["model"].apply(st["params"], b, st["ctx"], False)[0])
        got = np.asarray(infer(X[idx], np.asarray(cohort.ages)[idx]))
        np.testing.assert_array_equal(got, live)
    finally:
        spmm.set_backend("xla")
        spmm.set_spmm_dtype(None)


def test_export_cli(tmp_path):
    import multilevel_gnn_tpu.train.cli as cli
    import multilevel_gnn_tpu.train.export as export

    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text(
        "cancer_type: synth\nmodel: multilevel_gnn\ngnn_name: sage\n"
        "num_run: 1\nepochs: 2\nbatch_size: 8\nsplit_shaffle: true\n"
        "split_seed: 3\nckpt_every: 2\n"
    )
    cli.main([
        "--config", str(cfgp), "--synthetic", "--debug",
        "--ckpt-dir", str(tmp_path / "ckpt"),
    ])
    export.main([
        "--config", str(cfgp), "--synthetic", "--debug",
        "--ckpt-dir", str(tmp_path / "ckpt"),
        "--out", str(tmp_path / "export"),
    ])
    meta = json.loads((tmp_path / "export" / "meta.json").read_text())
    assert meta["batch_size"] == 8
    assert (tmp_path / "export" / "model.stablehlo").stat().st_size > 0
    infer = load_exported(str(tmp_path / "export"))
    x = np.zeros((8, meta["n_nodes"]), np.float32)
    p = np.asarray(infer(x, np.zeros(8, np.float32)))
    assert p.shape[0] == 8 and np.isfinite(p).all()
