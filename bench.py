"""Benchmark harness — prints ONE JSON line; headline = the workload.

Headline metric: edges/s/chip of the FULL flagship train step (fwd + bwd +
adam, incl. gather, conv stack, heads) at GBM production scale
(N=15405 node slots, E~154k edges incl self loops, B=32, C=64), on the
shipped config stack (pallas kernels + bf16 messages + windowed SpMM +
bf16 compute trunk) over the realistic cohort-like community topology.
vs_baseline is the speedup over the same step on the XLA-backend fallback
on the SAME graph.  Random-topology (locality worst case) numbers are
kept as extra fields for continuity with earlier rounds.

Extra fields in the same JSON object (VERDICT r1 #8):
  spmm_{pallas_f32,pallas_bf16,xla}_edges_per_s — the kernel micro-bench
  train_step_ms / train_step_xla_ms — flagship step times
  epoch_s, cv_s — synthetic-cohort 5-fold CV (1 run x 10 epochs, the
      round-1 670 s protocol) measured through the real experiment driver;
      skipped (null) if the time budget (MGTPU_BENCH_BUDGET_S, default
      1800 s) would be exceeded.

A persistent compilation cache is enabled: on this TPU, XLA scatter and
Mosaic kernels compile through a remote-compile path costing minutes per
shape; the cache (checked into the workspace dir) amortizes across rounds.

Honest timing (CLAUDE.md bench-honesty note): chained inputs (x := f(x)),
fresh data seed per invocation (the tunnel replays cached results for a
previously-executed chain of identical values), and timed windows ending
in a scalar device->host FETCH (the tunnel's block_until_ready can return
before execution completes).
"""
from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

try:
    import numpy as np
except ModuleNotFoundError:  # pragma: no cover - environment guard
    # The r5s2 container ships a bare `python` on PATH (no numpy/jax);
    # the working stack lives in /opt/venv (same binary, venv-activated
    # via its pyvenv.cfg — realpaths match, so guard with an env marker).
    # Re-exec there so a driver invoking plain `python bench.py` still
    # produces the round's JSON line (subprocess arms inherit
    # sys.executable, so they follow).
    _VENV = "/opt/venv/bin/python"
    if os.path.exists(_VENV) and not os.environ.get("MGTPU_BENCH_REEXEC"):
        os.environ["MGTPU_BENCH_REEXEC"] = "1"
        os.execv(_VENV, [_VENV] + sys.argv)
    raise

_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE_PATH = os.path.join(_REPO, "bench_cache.json")
_ANCHORS_PATH = os.path.join(_REPO, "ANCHORS.json")


def _git_head() -> str:
    try:
        return subprocess.run(
            ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return "unknown"


def _load_arm_cache() -> dict:
    """Repo-tracked last-good per-arm results (VERDICT r3 Next #1a): a
    tunnel wave that eats an arm must not erase the round's evidence —
    the final JSON carries the cached value, stamped carried_forward."""
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_arm_cache(cache: dict) -> None:
    tmp = _CACHE_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    os.replace(tmp, _CACHE_PATH)


def _env_capture() -> dict:
    """Backend/version provenance (VERDICT r3 Next #2): makes 'remote
    codegen drift' a diffable fact instead of a hypothesis."""
    out = {}
    try:
        import jax

        out["jax"] = jax.__version__
        import jaxlib

        out["jaxlib"] = getattr(jaxlib, "__version__", "?")
        d = jax.devices()[0]
        out["platform"] = d.platform
        try:
            out["platform_version"] = d.client.platform_version
        except Exception:
            pass
        try:
            out["device_kind"] = d.device_kind
        except Exception:
            pass
    except Exception as e:
        out["error"] = f"{type(e).__name__}: {e}"
    return out


def _anchor_report(extras: dict) -> tuple[dict, list, list]:
    """Compare measured fields against ANCHORS.json (VERDICT r3 Next #2).
    Returns (deltas_pct, regressions, watch): delta > 0 means BETTER than
    anchor; fields more than tolerance_pct WORSE land in ``regressions``,
    UNLESS the anchor is marked ``known_external: true`` (documented
    backend/service drift outside our code — VERDICT r4 Next #1c), in
    which case they land in ``watch`` so a standing external flag cannot
    bury a genuinely new regression.

    An anchor entry may carry its own ``tolerance_pct`` overriding the
    global one: wall-clock arms (cv_s, cv_foldparallel_s) absorb host
    MI/PCA derivation + tunnel dispatch variance measured at +/-45%
    run-to-run in the r5s2 container while the device-side indicator
    (epoch_median_s) is stable to ~1% — the tight tolerance belongs on
    the stable metric, the wide one on the walls it rides inside."""
    try:
        with open(_ANCHORS_PATH) as f:
            spec = json.load(f)
    except Exception:
        return {}, [], []
    tol_global = float(spec.get("tolerance_pct", 10))
    deltas, regressions, watch = {}, [], []
    for field, a in spec.get("anchors", {}).items():
        v = extras.get(field)
        if not v:
            continue
        tol = float(a.get("tolerance_pct", tol_global))
        ref = float(a["value"])
        if a.get("better", "lower") == "lower":
            pct = (ref - v) / ref * 100.0  # positive = faster than anchor
        else:
            pct = (v - ref) / ref * 100.0  # positive = higher throughput
        deltas[field] = round(pct, 1)
        if pct < -tol:
            msg = f"{field}: {v:.4g} vs anchor {ref:.4g} ({pct:+.1f}%)"
            if a.get("known_external"):
                watch.append(msg + " [known_external]")
            else:
                regressions.append(msg)
    return deltas, regressions, watch


def _codegen_report(extras: dict) -> dict:
    """Diff this run's edit-insensitive codegen hashes against the
    committed baseline (ANCHORS.json 'codegen' section, VERDICT r4 Next
    #5): for each kernel arm report 'same' / 'changed' / 'new' so a perf
    delta can mechanically say 'same HLO, same binary, X% slower =>
    backend' instead of a hand decomposition."""
    try:
        with open(_ANCHORS_PATH) as f:
            base = json.load(f).get("codegen", {})
    except Exception:
        return {}
    report = {}
    for key, want in base.items():
        got = extras.get(f"{key}_codegen")
        if not isinstance(got, dict):
            continue
        status = {}
        for h in ("hlo_hash", "compiled_hash"):
            if h not in want:
                continue
            g = got.get(h)
            status[h] = (
                "same" if g == want[h]
                else "unavailable" if not isinstance(g, str) or ":" in g
                # compiled text is CROSS-PROCESS nondeterministic even at
                # fixed source + fixed backend (measured r5s2: in-process
                # repeats match, a fresh process differs) — a mismatch is
                # advisory, only hlo_hash drives the drift verdict
                else "changed" if h == "hlo_hash"
                else "changed (advisory: cross-process nondeterministic)"
            )
        report[key] = status
    return report


def timeit_chained(fn, x0, iters=40, warmup=2):
    """x := fn(x) chained so every iteration sees fresh values — the axon
    tunnel caches identical executions, so same-input timing loops report
    elided (impossibly fast) results.  The timed window ENDS with a scalar
    device->host fetch, not block_until_ready: the tunnel's block can
    return before execution completes (measured: 40 ms steps reported as
    0.3 ms), while a value fetch always forces materialization.  One fetch
    RTT (~40 ms) amortizes over iters."""
    import jax
    import jax.numpy as jnp

    x = x0
    for _ in range(warmup):
        x = fn(x)
    _ = float(jnp.sum(x))  # force warmup completion
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters


def _stable_program_hash(text: str) -> str:
    """Hash HLO/stablehlo text with source-location metadata stripped.

    The program text embeds bench.py file/line provenance (``loc("...")``
    tokens and ``metadata={...source_line=N}``), so unrelated edits to
    this file shifted the codegen fingerprints across rounds (observed
    r4: hlo_hash 5944667d -> 0b15081d with identical perf).  Hashing
    only the program structure makes the drift tripwire edit-insensitive.

    The serialized Mosaic kernel payload (``body: <base64>`` inside the
    tpu_custom_call backend_config) is PER-TRACE NONDETERMINISTIC: the
    same program lowered twice in one process differs by ~2 bytes of
    MLIR bytecode (measured r5s2 — an internal counter/id), so hashing
    it raw made the pallas fingerprints useless.  Payload bodies are
    replaced by a length surrogate; kernel-source changes are tracked
    by git (and usually move the length), while the tripwire's real job
    — detecting backend drift at fixed source — rides the surrounding
    program structure and the payload size."""
    import re

    text = re.sub(r'loc\("[^"]*"[^)]*\)', "loc()", text)
    text = re.sub(r"metadata=\{[^}]*\}", "", text)
    text = re.sub(
        r'(body\\?(?:"|\\22):\s*\\?(?:"|\\22))([A-Za-z0-9+/=]+)',
        lambda m: m.group(1) + f"len{len(m.group(2))}",
        text,
    )
    return hashlib.sha256(text.encode()).hexdigest()[:16]


def bench_spmm(backend: str, seed=0, fingerprint=False):
    """fingerprint=True also returns codegen hashes (pre-opt HLO + post-
    compile text when the backend exposes it) so kernel-throughput drift
    across rounds can be attributed to OUR code vs remote codegen
    (VERDICT r3 Next #2)."""
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.core.graph import Graph
    from multilevel_gnn_tpu.ops import spmm

    # topology from a FIXED seed (stable shapes -> compile-cache hits);
    # feature values from the caller's fresh seed (value-cache honesty)
    rng = np.random.RandomState(0)
    rng_data = np.random.RandomState(seed)
    N, E, B, C = 15405, 150_000, 32, 64
    edges = rng.randint(0, N, size=(2, E))
    attr = rng.rand(E).astype(np.float32)
    g = Graph.from_edges(edges, attr, N)
    if backend == "pallas":
        g = g.with_sorted_meta()
    x = jnp.asarray(rng_data.randn(B, N, C).astype(np.float32))

    fn = jax.jit(
        lambda x: spmm.gather_scatter(x, g, "mean", g.edge_attr, backend=backend)
        + 0.001  # keep chained values finite
    )
    # transfer the 126 MB input BEFORE the compile window: through the
    # remote tunnel the first-call cost is dominated by host->device
    # transfer + tunnel weather, which used to masquerade as "compile"
    # (observed: the same cache-HIT entry reporting 4.4 s one process and
    # 99 s the next)
    x = jax.block_until_ready(jax.device_put(x))
    fp = None
    if fingerprint:
        fp = {}
        try:
            lowered = fn.lower(x)
            fp["hlo_hash"] = _stable_program_hash(lowered.as_text())
            compiled = lowered.compile()  # populates fn's executable cache
            try:
                # post-optimization text embeds the Mosaic custom-call
                # payload -> captures remote codegen drift
                fp["compiled_hash"] = _stable_program_hash(compiled.as_text())
            except Exception as e:
                fp["compiled_hash"] = f"unavailable: {type(e).__name__}"
        except Exception as e:
            fp["error"] = f"{type(e).__name__}: {e}"
    t0 = time.perf_counter()
    out = fn(x)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    dt = timeit_chained(fn, x)
    if fingerprint:
        return B * E / dt, dt, compile_s, out, fp
    return B * E / dt, dt, compile_s, out


def bench_train_step(backend="pallas", bf16=True, topology="random",
                     windowed=False, seed=0, compute_dtype=None):
    """seed: vary to defeat the axon tunnel's cross-process VALUE cache —
    an identical (executable, input-values) chain replayed in a later
    process reports elided times even though each step's inputs differ
    within the chain (measured: 40 ms step replayed as 0.33 ms)."""
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.data.synthetic import make_gbm_scale_setup
    from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN
    from multilevel_gnn_tpu.ops import spmm
    from multilevel_gnn_tpu.train.step import build_train_fns

    spmm.set_backend(backend)
    spmm.set_spmm_dtype(jnp.bfloat16 if (bf16 and backend == "pallas") else None)
    cfg, model, graph, ctx, batch = make_gbm_scale_setup(
        topology=topology, windowed=windowed, seed=seed,
        # pinned topology: executable shapes stay stable (compile-cache
        # hits across rounds) while the clock-derived seed keeps batch
        # values fresh (tunnel value-cache honesty)
        topo_seed=0,
    )
    if compute_dtype is not None:
        cfg = cfg.replace(compute_dtype=compute_dtype)
        model = MultilevelGNN(cfg)
    B = batch.x.shape[0]
    fns = build_train_fns(model, cfg)
    params, opt_state = fns.init_state(jax.random.PRNGKey(0), batch, ctx, 10)
    cw = jnp.ones(2, jnp.float32)
    key = jax.random.PRNGKey(1)
    # pre-transfer inputs so the "compile" window measures program
    # load/compile, not the batch's host->device bytes (see bench_spmm)
    batch, ctx = jax.block_until_ready(jax.device_put((batch, ctx)))

    try:
        t0 = time.perf_counter()
        params, opt_state, loss = fns.train_step(
            params, opt_state, batch, ctx, cw, key
        )
        _ = float(loss)  # fetch forces completion (tunnel block is unreliable)
        compile_s = time.perf_counter() - t0
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = fns.train_step(
                params, opt_state, batch, ctx, cw, key
            )
        _ = float(loss)  # timed window ends with a value fetch, see
        # timeit_chained docstring; one RTT amortizes over iters
        dt = (time.perf_counter() - t0) / iters
    finally:
        spmm.set_backend("xla")
        spmm.set_spmm_dtype(None)
    return dt, compile_s, graph.n_edges, B


_EXPORT_EVAL_LOADER = r"""
import json, sys, time
import numpy as np
# serving-process surface: jax + the code-free loader only (the artifact
# embeds the model; no flax / model classes are touched at load time)
from multilevel_gnn_tpu.train.export import load_exported
from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
art_dir, io_path = sys.argv[1], sys.argv[2]
z = np.load(io_path)
xs = [z[k] for k in sorted(z.files) if k.startswith("x_")]
age = z["age"]
import jax

t0 = time.time()
infer = load_exported(art_dir)
xs = [jax.device_put(x) for x in xs]
age = jax.device_put(age)
p0 = np.asarray(infer(xs[0], age))  # first call: program load
load_s = time.time() - t0
# timed window over DISTINCT inputs (the tunnel value-caches identical
# executions) ending in a host fetch; 2 sweeps amortize the fetch RTT
t0 = time.perf_counter()
reps = 2
for _ in range(reps):
    for x in xs[1:]:
        p = infer(x, age)
    _ = float(np.asarray(p)[0, 0])
dt_ms = (time.perf_counter() - t0) / (reps * (len(xs) - 1)) * 1e3
np.save(io_path + ".preds.npy", p0)
print(json.dumps({"export_eval_ms": dt_ms, "export_load_s": load_s}))
"""


def bench_export_eval(seed=0):
    """Exported-artifact fidelity on the live backend (VERDICT r4 Next
    #6): export the shipped-stack fold (reference-scale synthetic cohort,
    146 pathways / 15.4k node slots) as a StableHLO artifact, load it in
    a FRESH process, run eval on a cohort batch, and assert prediction
    equality against the live model while recording serving latency.
    Reference basis: the serving surface implied by ckpt_util.py:27-83's
    load path — the reference itself has no deployment story."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.core.batch import Batch
    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
    from multilevel_gnn_tpu.train.export import export_fold, save_exported
    from multilevel_gnn_tpu.train.predict import load_fold_state
    from multilevel_gnn_tpu.utils.runtime import configure_backend

    cfg = Config.from_yaml(
        os.path.join(os.path.dirname(__file__), "configs", "gbm.yaml"),
        num_run=1, epochs=1,
    )
    configure_backend(cfg)
    cohort = make_synthetic_cohort(
        cfg, seed=2, n_patients=100, n_pathways=146, genes_per_pathway=38,
        overlap=3, n_edges=60000,
    )
    st = load_fold_state(cfg, cohort, None)  # PRNGKey(0) params, no ckpt
    ex = export_fold(cfg, cohort, None, params=st["params"])
    tmp = tempfile.mkdtemp(prefix="mgtpu_export_eval_")
    art_dir = os.path.join(tmp, "artifact")
    save_exported(art_dir, ex)

    B = ex["meta"]["batch_size"]
    X = np.asarray(st["X"])
    rng = np.random.RandomState(seed)
    # distinct input batches (value-cache honesty): real cohort rows with
    # per-variant resampled patient subsets
    xs = [X[rng.randint(0, X.shape[0], size=B)] for _ in range(9)]
    age = np.asarray(cohort.ages)[:B]
    io_path = os.path.join(tmp, "io.npz")
    np.savez(io_path, age=age,
             **{f"x_{i:02d}": x for i, x in enumerate(xs)})

    # live-model prediction on variant 0 (the equality oracle)
    b = Batch(x=jnp.asarray(xs[0]), y=jnp.zeros((B, 2), jnp.float32),
              age=jnp.asarray(age), sample_mask=jnp.ones(B, bool))
    live, _ = st["model"].apply(st["params"], b, st["ctx"], False)
    live = np.asarray(live)

    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", _EXPORT_EVAL_LOADER, art_dir, io_path],
        capture_output=True, text=True, timeout=900, env=env,
    )
    sys.stderr.write(r.stderr[-2000:])
    got = json.loads(r.stdout.strip().splitlines()[-1])
    loaded = np.load(io_path + ".preds.npy")
    max_diff = float(np.max(np.abs(loaded - live)))
    # Bitwise equality holds on CPU (test_export.py roundtrip) but NOT
    # across two separately-compiled TPU executables: the live jit and
    # the reloaded StableHLO artifact compile through different
    # pipelines, and fusion-order differences at the bf16/f32
    # boundaries move class probabilities by ~1e-5 (measured 4.3e-5,
    # BENCH r5 pass 1).  The fidelity assertion is therefore a
    # documented tolerance on probabilities, with the raw max-diff
    # reported alongside.
    got["export_eval_equal"] = bool(max_diff == 0.0)
    got["export_eval_match"] = bool(max_diff <= 1e-3)
    got["export_eval_max_abs_diff"] = max_diff
    got["export_artifact_bytes"] = os.path.getsize(
        os.path.join(art_dir, "model.stablehlo")
    )
    return got


def _wait_for_tpu(max_tries=8, probe_timeout=150, sleep_s=30):
    """The TPU tunnel has bad waves where even device init HANGS (no
    exception).  Probe it in a killable subprocess and retry with sleeps so
    a wave doesn't hang the whole bench run; give up after ~20 min."""
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return True
    code = (
        "import jax, jax.numpy as jnp; jax.devices(); "
        "jnp.ones((8, 8)).sum().block_until_ready(); print('tpu-probe-ok')"
    )
    for i in range(max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=probe_timeout,
                capture_output=True,
                text=True,
            )
            if "tpu-probe-ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"tpu probe {i + 1}/{max_tries} failed; retrying", file=sys.stderr)
        time.sleep(sleep_s)
    return False


def bench_fold_deriv():
    """Host data-pipeline fold derivation at REFERENCE scale (146 pathways,
    ~5.1k genes x 3 omics = 15.4k node slots, 400 patients): per-fold MI
    mask (C++ kNN estimator) + per-pathway PCA + edge re-selection + graph
    build.  BASELINE's 'data preprocessing time' anchor; the reference
    pays ~22 s of sklearn MI alone per fold at this shape."""
    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort

    cfg = Config.from_yaml(
        os.path.join(os.path.dirname(__file__), "configs", "gbm.yaml"),
        num_run=1, epochs=1,
    )
    cohort = make_synthetic_cohort(
        cfg, seed=2, n_patients=400, n_pathways=146, genes_per_pathway=38,
        overlap=3, n_edges=60000,
    )
    import numpy as np

    t0 = time.time()
    cohort.fold(np.arange(320), fold_i=0)
    cold = time.time() - t0
    t0 = time.time()
    cohort.fold(np.arange(10, 330), fold_i=1)
    return cold, time.time() - t0


def bench_cv(seed=0):
    """Synthetic-cohort full CV through the real experiment driver (the
    round-1 670 s protocol: configs/gbm.yaml, 1 run x 5 folds x 10 epochs,
    200 patients, incl. per-fold host MI/PCA).

    TWO passes: the first (reported as cv_first_s) absorbs the
    process's first-dispatch windows — on the axon tunnel a cache-HIT
    program load measured 100-560 s in bad weather, which used to
    masquerade as CV cost (r4: cv_s 156-196 s while median epoch was
    0.010 s).  The second pass, on a FRESH cohort (fresh values -> no
    tunnel value-cache elision, CLAUDE.md BENCH HONESTY), is the
    steady-state wall a warm production process pays and is the
    headline cv_s.

    seed: clock-derived by main() — a fixed cohort seed would replay the
    axon tunnel's cross-process value cache and report elided times on
    reruns."""
    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
    from multilevel_gnn_tpu.train.driver import run_experiment
    from multilevel_gnn_tpu.utils.runtime import configure_backend

    cfg = Config.from_yaml(
        os.path.join(os.path.dirname(__file__), "configs", "gbm.yaml"),
        num_run=1, epochs=10,
    )
    configure_backend(cfg)
    cohort = make_synthetic_cohort(
        cfg, seed=seed, n_patients=200, n_pathways=20
    )
    # production recipe (VERDICT r4 Next #1a): mgtpu-warm's AOT pre-flight
    # compiles every executable BEFORE any timed pass, so program-load
    # weather lands here (reported separately as cv_warm_s) instead of
    # inflating the walls the anchors are set from
    from multilevel_gnn_tpu.train.warm import warm_experiment

    warm_s = warm_experiment(cfg, cohort)["warm_s"]
    first = run_experiment(cfg, cohort)
    cohort2 = make_synthetic_cohort(
        cfg, seed=seed + 1, n_patients=200, n_pathways=20
    )
    res = run_experiment(cfg, cohort2)
    return (
        res["wall_time_s"], res.get("epoch_s_median"),
        first["wall_time_s"], warm_s,
    )


def bench_cv_foldparallel(seed=0):
    """Same protocol through the fold-vectorized driver: since r4 all 5
    folds x 10 epochs advance as ONE vmapped dispatch even at
    devices=None (train/fold_parallel.py one-dispatch loop; the r3
    per-step regime call was a mismeasurement — see
    tools/bench_fold_decomp.py).  Sharding the unit axis (devices=N) is
    the scaling regime; this arm tracks the single-chip cost.

    Two passes like bench_cv: the second (fresh-cohort) wall is the
    reported number; the first absorbs the process's program-load
    weather windows (200-560 s observed for the vmapped executables)."""
    from multilevel_gnn_tpu.core.config import Config
    from multilevel_gnn_tpu.data.synthetic import make_synthetic_cohort
    from multilevel_gnn_tpu.train.fold_parallel import (
        run_experiment_foldparallel,
    )
    from multilevel_gnn_tpu.utils.runtime import configure_backend

    cfg = Config.from_yaml(
        os.path.join(os.path.dirname(__file__), "configs", "gbm.yaml"),
        num_run=1, epochs=10,
    )
    configure_backend(cfg)
    cohort = make_synthetic_cohort(
        cfg, seed=seed, n_patients=200, n_pathways=20
    )
    first = run_experiment_foldparallel(cfg, cohort)
    cohort2 = make_synthetic_cohort(
        cfg, seed=seed + 1, n_patients=200, n_pathways=20
    )
    res = run_experiment_foldparallel(cfg, cohort2)
    return (
        res["wall_time_s"], res.get("epoch_s_median"),
        first["wall_time_s"],
    )


def run_inproc(seed=None):
    t_start = time.time()
    budget_s = float(os.environ.get("MGTPU_BENCH_BUDGET_S", 1800))
    if not _wait_for_tpu():
        print(json.dumps({"metric": "flagship_train_step_edges_per_s_per_chip",
                          "value": 0, "unit": "edges/s", "vs_baseline": 0,
                          "error": "tpu tunnel unavailable"}))
        return

    import jax

    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    # fresh data values every invocation: the tunnel replays cached results
    # for a previously-executed (executable, input-values) chain, so a
    # fixed seed would let a re-run report elided times (CLAUDE.md)
    if seed is None:
        seed = int(time.time()) % 1_000_000
    print(f"bench data seed: {seed}", file=sys.stderr)
    extras = {}

    # --- 1. SpMM kernel micro-bench (the round-1 headline, kept as fields)
    spmm_res = {}
    for tag in ("pallas_f32", "pallas_bf16", "xla"):
        try:
            if tag == "pallas_bf16":
                import jax.numpy as jnp

                from multilevel_gnn_tpu.ops import spmm as _spmm

                _spmm.set_spmm_dtype(jnp.bfloat16)
                try:
                    eps, dt, compile_s, out = bench_spmm("pallas", seed=seed)
                finally:
                    _spmm.set_spmm_dtype(None)
            else:
                eps, dt, compile_s, out = bench_spmm(tag.split("_")[0], seed=seed)
            spmm_res[tag] = eps
            extras[f"spmm_{tag}_edges_per_s"] = eps
            print(
                f"spmm {tag}: {eps:.3e} edges/s ({dt*1e3:.2f} ms, "
                f"compile {compile_s:.1f}s)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"spmm {tag} failed: {type(e).__name__}: {e}", file=sys.stderr)

    # --- 2. flagship train step: shipped path (pallas + bf16) vs XLA backend
    step_eps = step_vs = 0.0
    try:
        dt, compile_s, n_edges, B = bench_train_step("pallas", bf16=True, seed=seed)
        extras["train_step_ms"] = dt * 1e3
        step_eps = B * n_edges / dt
        print(
            f"flagship train step pallas-bf16 (B={B}, E={n_edges}): "
            f"{dt*1e3:.2f} ms (compile {compile_s:.1f}s)",
            file=sys.stderr,
        )
        dt_x, compile_s, _, _ = bench_train_step("xla", bf16=False, seed=seed)
        extras["train_step_xla_ms"] = dt_x * 1e3
        step_vs = dt_x / dt
        print(
            f"flagship train step xla: {dt_x*1e3:.2f} ms "
            f"(compile {compile_s:.1f}s)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"train-step bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # --- 2b. realistic (cohort-like community) topology: composed vs the
    # windowed locality-blocked SpMM (cfg.windowed_spmm) vs the FULL
    # shipped config stack (windowed + bf16 compute trunk), plus the XLA
    # backend on the SAME graph.  Real STRING/GRN cohort graphs are
    # community-structured; the uniform-random graph above is the worst
    # case for locality and does not occur in the actual workload — so the
    # shipped-stack number on this topology is the HEADLINE, with
    # vs_baseline the like-for-like XLA-backend step on the same graph.
    try:
        for wtag, backend, bf16, win, cd in (
            ("cohort_xla", "xla", False, False, None),
            ("cohort", "pallas", True, False, None),
            ("cohort_windowed", "pallas", True, True, None),
            ("cohort_shipped", "pallas", True, True, "bfloat16"),
        ):
            dt_c, compile_s, n_edges_c, B = bench_train_step(
                backend, bf16=bf16, topology="cohort", windowed=win,
                seed=seed, compute_dtype=cd,
            )
            extras[f"train_step_{wtag}_ms"] = dt_c * 1e3
            print(
                f"flagship train step {wtag} (E={n_edges_c}): "
                f"{dt_c*1e3:.2f} ms (compile {compile_s:.1f}s)",
                file=sys.stderr,
            )
        if extras.get("train_step_cohort_shipped_ms"):
            step_eps = B * n_edges_c / (
                extras["train_step_cohort_shipped_ms"] / 1e3
            )
            step_vs = (
                extras["train_step_cohort_xla_ms"]
                / extras["train_step_cohort_shipped_ms"]
            )
            # promoted alias (VERDICT r2 #10): the shipped-stack step is
            # the headline; make it unmissable next to `value`
            extras["train_step_shipped_ms"] = extras[
                "train_step_cohort_shipped_ms"
            ]
    except Exception as e:
        print(f"cohort-topology step bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # --- 2b. host fold derivation at reference scale (CPU-only, quick)
    try:
        cold, warm = bench_fold_deriv()
        extras["fold_deriv_s"] = warm
        print(
            f"fold derivation (146 pathways, 15.4k slots, 400 patients): "
            f"{cold:.2f} s cold / {warm:.2f} s warm",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"fold-deriv bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # --- 3. full CV through the driver (budget-gated)
    extras["cv_s"] = extras["epoch_s"] = None
    remaining = budget_s - (time.time() - t_start)
    if os.environ.get("MGTPU_BENCH_FAST") != "1" and remaining > 600:
        try:
            cv_s, epoch_s, _, _ = bench_cv(seed=seed)
            extras["cv_s"] = extras["cv_wall_s"] = cv_s
            extras["epoch_s"] = extras["epoch_median_s"] = epoch_s
            print(f"synthetic CV (1x5 folds, 10 epochs): {cv_s:.0f} s, "
                  f"median epoch {epoch_s:.2f} s", file=sys.stderr)
        except Exception as e:
            print(f"cv bench failed: {type(e).__name__}: {e}", file=sys.stderr)
    else:
        print(f"cv bench skipped (remaining budget {remaining:.0f} s)",
              file=sys.stderr)

    # --- 3b. fold-vectorized CV (all folds as one vmapped step)
    extras["cv_foldparallel_s"] = extras["epoch_foldparallel_s"] = None
    remaining = budget_s - (time.time() - t_start)
    if os.environ.get("MGTPU_BENCH_FAST") != "1" and remaining > 400:
        try:
            fp_s, fp_epoch, _ = bench_cv_foldparallel(seed=seed)
            extras["cv_foldparallel_s"] = fp_s
            extras["epoch_foldparallel_s"] = fp_epoch
            print(
                f"fold-parallel CV (5 folds lockstep, 10 epochs): {fp_s:.0f} s,"
                f" median all-folds epoch {fp_epoch:.2f} s", file=sys.stderr,
            )
        except Exception as e:
            print(f"fold-parallel cv bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    else:
        print(f"fold-parallel cv skipped (remaining budget {remaining:.0f} s)",
              file=sys.stderr)

    if step_eps == 0.0 and spmm_res:
        # train-step failed — fall back to the spmm headline so the round
        # still records a comparable number
        best = max(spmm_res, key=spmm_res.get)
        vs = spmm_res[best] / spmm_res["xla"] if "xla" in spmm_res else 1.0
        print(json.dumps({
            "metric": f"spmm_edges_per_s_per_chip[{best}]",
            "value": spmm_res[best], "unit": "edges/s",
            "vs_baseline": vs, **extras,
        }))
        return
    print(json.dumps({
        "metric": "flagship_train_step_edges_per_s_per_chip",
        "value": step_eps,
        "unit": "edges/s",
        "vs_baseline": step_vs,
        **extras,
    }))


# ---- per-arm subprocess harness ----
# The axon tunnel can wedge MID-RUN (observed 2026-08-19: a pathological
# remote compile blocked the whole in-process bench for ~20 min; a worse
# wave would have produced NO numbers for the round).  The default entry
# point therefore runs every arm in its OWN subprocess with a timeout —
# the parent never imports jax (so it can never block on the tunnel), a
# hung arm is killed and recorded as an error, and the tunnel is re-probed
# before the next arm.  Headline arms run FIRST so budget exhaustion drops
# diagnostics, not the round's metric.  The persistent compilation cache
# (.jax_cache/) is shared across arm processes, so warm-compile behavior
# is identical to the in-process bench.

_STEP_ARMS = {
    # name: (backend, bf16, topology, windowed, compute_dtype, ms_field)
    "step_cohort_xla": ("xla", False, "cohort", False, None,
                        "train_step_cohort_xla_ms"),
    "step_cohort": ("pallas", True, "cohort", False, None,
                    "train_step_cohort_ms"),
    "step_cohort_windowed": ("pallas", True, "cohort", True, None,
                             "train_step_cohort_windowed_ms"),
    "step_cohort_shipped": ("pallas", True, "cohort", True, "bfloat16",
                            "train_step_cohort_shipped_ms"),
    "step_random": ("pallas", True, "random", False, None, "train_step_ms"),
    "step_random_xla": ("xla", False, "random", False, None,
                        "train_step_xla_ms"),
}


def run_arm(name: str, seed: int):
    """Run ONE bench arm in this process; print ONE JSON line to stdout."""
    out = {}
    if name == "fold_deriv":
        cold, warm = bench_fold_deriv()
        print(json.dumps({"fold_deriv_s": warm, "fold_deriv_cold_s": cold}))
        return
    if not _wait_for_tpu(max_tries=3):
        print(json.dumps({"error": f"{name}: tpu tunnel unavailable"}))
        return
    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    if name in _STEP_ARMS:
        backend, bf16, topo, win, cd, field = _STEP_ARMS[name]
        dt, compile_s, n_edges, B = bench_train_step(
            backend, bf16=bf16, topology=topo, windowed=win, seed=seed,
            compute_dtype=cd,
        )
        out = {field: dt * 1e3, field.replace("_ms", "_compile_s"): compile_s}
        if name == "step_cohort_shipped":
            out["cohort_edges"], out["batch"] = n_edges, B
        if name == "step_random":
            out["random_edges"] = n_edges
    elif name.startswith("spmm_"):
        tag = name[len("spmm_"):]
        if tag == "pallas_bf16":
            import jax.numpy as jnp

            from multilevel_gnn_tpu.ops import spmm as _spmm

            _spmm.set_spmm_dtype(jnp.bfloat16)
            try:
                eps, dt, compile_s, _, fp = bench_spmm(
                    "pallas", seed=seed, fingerprint=True
                )
            finally:
                _spmm.set_spmm_dtype(None)
        else:
            eps, dt, compile_s, _, fp = bench_spmm(
                tag.split("_")[0], seed=seed, fingerprint=True
            )
        out = {
            f"spmm_{tag}_edges_per_s": eps,
            f"spmm_{tag}_compile_s": compile_s,
        }
        if fp:
            out[f"spmm_{tag}_codegen"] = fp
        if tag == "pallas_f32":  # once per run is enough
            out["backend_env"] = _env_capture()
    elif name == "cv":
        cv_s, epoch_s, first_s, warm_s = bench_cv(seed=seed)
        out = {"cv_s": cv_s, "cv_wall_s": cv_s, "epoch_s": epoch_s,
               "epoch_median_s": epoch_s, "cv_first_s": first_s,
               "cv_warm_s": warm_s}
    elif name == "cv_foldparallel":
        fp_s, fp_epoch, first_s = bench_cv_foldparallel(seed=seed)
        out = {"cv_foldparallel_s": fp_s, "epoch_foldparallel_s": fp_epoch,
               "cv_foldparallel_first_s": first_s}
    elif name == "export_eval":
        out = bench_export_eval(seed=seed)
    else:
        out = {"error": f"unknown arm {name}"}
    print(json.dumps(out))


def orchestrate():
    """Parent entry point: run each arm as a timed subprocess, aggregate,
    and ALWAYS print the final one-line JSON."""
    t_start = time.time()
    # r3 lesson: 1800 s let two 480 s timeouts exhaust the retry budget and
    # the round shipped a null headline (VERDICT r3 Weak #1) — default up
    budget_s = float(os.environ.get("MGTPU_BENCH_BUDGET_S", 4200))
    fast = os.environ.get("MGTPU_BENCH_FAST") == "1"
    seed = int(time.time()) % 1_000_000
    print(f"bench data seed: {seed} (per-arm subprocesses)", file=sys.stderr)
    extras = {
        "cv_s": None, "epoch_s": None,
        "cv_foldparallel_s": None, "epoch_foldparallel_s": None,
    }
    errors = []
    arm_cache = _load_arm_cache()
    head = _git_head()
    succeeded = set()

    # (name, timeout_s, min_remaining_s, cpu_only).  The HEADLINE arm
    # (step_cohort_shipped) runs FIRST (VERDICT r3 Next #1b) — budget
    # exhaustion must drop diagnostics, never the round's metric.  Its XLA
    # denominator runs second.
    plan = [
        ("step_cohort_shipped", 600, 120, False),
        ("step_cohort_xla", 480, 120, False),
        ("step_cohort_windowed", 480, 120, False),
        ("step_cohort", 480, 120, False),
        ("cv", 1200, 300, False),
        ("step_random", 480, 120, False),
        ("step_random_xla", 480, 120, False),
        ("fold_deriv", 420, 60, True),
        ("spmm_pallas_bf16", 900, 90, False),
        ("spmm_xla", 900, 90, False),
        ("spmm_pallas_f32", 1500, 120, False),
        # serving-artifact fidelity: export + fresh-process load + eval
        ("export_eval", 900, 150, False),
        # two-pass arm: the first pass alone measured up to 615 s of
        # program-load weather before the reported second pass starts
        ("cv_foldparallel", 1500, 300, False),
    ]
    def _run_one(name, arm_timeout, min_req, cpu_only):
        """Returns True on success (extras updated)."""
        remaining = budget_s - (time.time() - t_start)
        if remaining < min_req:
            print(f"arm {name} skipped (remaining budget {remaining:.0f} s)",
                  file=sys.stderr)
            return False
        env = dict(os.environ)
        if cpu_only:
            env["PALLAS_AXON_POOL_IPS"] = ""
            env["JAX_PLATFORMS"] = "cpu"
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--arm", name, "--seed", str(seed)],
                timeout=min(arm_timeout, max(remaining - 30, min_req)),
                capture_output=True, text=True, env=env,
            )
            sys.stderr.write(r.stderr[-4000:])
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
            got = json.loads(line)
            if "error" in got:
                errors.append(got["error"])
                print(f"arm {name} error: {got['error']}", file=sys.stderr)
                return False
            extras.update(got)
            succeeded.add(name)
            # persist last-good per-arm results (crash-safe: write per arm)
            arm_cache[name] = {
                "fields": got, "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                   time.gmtime()),
                "commit": head, "seed": seed,
                "wall_s": round(time.time() - t0, 1),
            }
            try:
                _save_arm_cache(arm_cache)
            except Exception as e:  # never let bookkeeping kill the bench
                print(f"arm-cache write failed: {e}", file=sys.stderr)
            print(f"arm {name} ok ({time.time() - t0:.0f} s)", file=sys.stderr)
            return True
        except subprocess.TimeoutExpired as e:
            if e.stderr:
                err = e.stderr
                sys.stderr.write(
                    err[-4000:] if isinstance(err, str)
                    else err[-4000:].decode(errors="replace")
                )
            errors.append(f"{name}: timeout after {time.time() - t0:.0f} s")
            print(f"arm {name} TIMED OUT ({time.time() - t0:.0f} s); "
                  "re-probing tunnel", file=sys.stderr)
            _wait_for_tpu(max_tries=3)  # parent-safe: subprocess probe only
        except Exception as e:  # malformed output etc.
            errors.append(f"{name}: {type(e).__name__}: {e}")
            print(f"arm {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        return False

    failed = []
    for name, arm_timeout, min_req, cpu_only in plan:
        if fast and name in ("cv", "cv_foldparallel"):
            continue
        if not _run_one(name, arm_timeout, min_req, cpu_only):
            failed.append((name, arm_timeout, min_req, cpu_only))
    # one retry pass while budget remains: arm timeouts are usually tunnel
    # WEATHER (observed: a 42 ms-steady arm blocked >480 s, the next arm
    # fine), so a later retry often lands
    for name, arm_timeout, min_req, cpu_only in failed:
        _run_one(name, arm_timeout, min_req, cpu_only)

    # ---- carry-forward (VERDICT r3 Next #1a): arms a wave ate are filled
    # from the repo-tracked last-good cache, clearly stamped with their
    # provenance so the round's evidence survives bad weather intact
    carried = {}
    for name in [p[0] for p in plan]:
        if name in succeeded or name not in arm_cache:
            continue
        rec = arm_cache[name]
        for k, v in rec["fields"].items():
            if extras.get(k) is None:
                extras[k] = v
        carried[name] = {"ts": rec["ts"], "commit": rec["commit"]}
        print(f"arm {name}: carried forward from {rec['ts']} "
              f"(commit {rec['commit']})", file=sys.stderr)
    if carried:
        extras["carried_forward"] = carried

    # ---- anchor tripwire (VERDICT r3 Next #2; r4 #1c known_external) ----
    deltas, regressions, watch = _anchor_report(extras)
    if deltas:
        extras["anchor_deltas_pct"] = deltas
    if regressions:
        extras["regressions"] = regressions
        for r in regressions:
            print(f"PERF REGRESSION vs anchor: {r}", file=sys.stderr)
    if watch:
        extras["watch"] = watch
        for w in watch:
            print(f"perf watch (known external): {w}", file=sys.stderr)

    # ---- codegen drift vs committed baseline (VERDICT r4 Next #5) ----
    cg = _codegen_report(extras)
    if cg:
        extras["codegen_vs_baseline"] = cg
        for key, st in cg.items():
            if "changed" in st.values():
                print(f"codegen drift: {key} {st}", file=sys.stderr)

    # ---- headline (same selection logic as the in-process path) ----
    shipped = extras.get("train_step_cohort_shipped_ms")
    cohort_xla = extras.get("train_step_cohort_xla_ms")
    value = vs = 0.0
    if shipped and extras.get("cohort_edges"):
        value = extras["batch"] * extras["cohort_edges"] / (shipped / 1e3)
        vs = (cohort_xla / shipped) if cohort_xla else 0.0
        extras["train_step_shipped_ms"] = shipped
    elif extras.get("train_step_ms") and extras.get("random_edges"):
        value = 32 * extras["random_edges"] / (extras["train_step_ms"] / 1e3)
        vs = (
            extras["train_step_xla_ms"] / extras["train_step_ms"]
            if extras.get("train_step_xla_ms") else 0.0
        )
    elif extras.get("spmm_pallas_bf16_edges_per_s"):
        value = extras["spmm_pallas_bf16_edges_per_s"]
        vs = (
            value / extras["spmm_xla_edges_per_s"]
            if extras.get("spmm_xla_edges_per_s") else 0.0
        )
        print(json.dumps({
            "metric": "spmm_edges_per_s_per_chip[pallas_bf16]",
            "value": value, "unit": "edges/s", "vs_baseline": vs,
            **extras, **({"errors": errors} if errors else {}),
        }))
        return
    print(json.dumps({
        "metric": "flagship_train_step_edges_per_s_per_chip",
        "value": value,
        "unit": "edges/s",
        "vs_baseline": vs,
        **extras,
        **({"errors": errors} if errors else {}),
    }))


def main():
    if "--arm" in sys.argv:
        i = sys.argv.index("--arm")
        seed = (
            int(sys.argv[sys.argv.index("--seed") + 1])
            if "--seed" in sys.argv else int(time.time()) % 1_000_000
        )
        run_arm(sys.argv[i + 1], seed)
    elif "--inproc" in sys.argv:
        run_inproc()
    else:
        orchestrate()


if __name__ == "__main__":
    main()
