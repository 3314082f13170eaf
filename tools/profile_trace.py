"""Per-region attribution of the shipped train step from a real profiler
trace (VERDICT r4 Next #2).

The r4 step decomposition (fwd 9.2 / bwd ~14.5 / "optimizer + dispatch
residue ~6 ms") left ~4 ms unattributed (isolated adam is 1.85 ms) and
the "no further single-chip lever" conclusion was drawn over it.  This
tool captures ONE ``jax.profiler`` trace of the step (10 iterations,
warm), parses the device-side HLO op stats with xprof, and aggregates
self-time into named regions keyed on the HLO metadata's module paths
(flax module names: gnn_0/gnn_1 convs, conv_head, learnable_pca...;
``transpose(...)`` marks backward ops; ``mosaic`` custom calls are the
Pallas kernels; adam shows under the optax update path).

Output: a JSON line with ms/step per region + the device total, plus the
top-25 individual ops — committed to docs/ROOFLINE.md's attribution
table.  Wall-vs-device gap = dispatch/host time the per-op table cannot
see (the tunnel adds RTT; compare total_device_ms to the chained wall
ms/step).

Usage (TPU): timeout 1800 python tools/profile_trace.py [composed]
Reference basis for the loop being profiled: train.py:38-68.
"""
import glob
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def classify(fw: str, category: str) -> str:
    """Region from the HLO metadata's framework-op path (flax module
    names).  Note: the optimizer has NO standalone ops in the shipped
    step's profile — XLA fuses the adam update into the gradient-
    producing backward fusions (verified: zero rows match 'adam'), so
    optimizer time is part of the bwd_* regions here."""
    if not fw:
        return "root_copies_layout"
    bwd = "transpose(" in fw
    if "pallas_call" in fw and "gather_pca_rows" not in fw:
        tag = "spmm_segment_kernel"
    elif "gather_pca_rows" in fw:
        tag = "pca_row_gather"
    elif "jit(_take)" in fw or "/gather:" in fw:
        tag = "edge_row_gather"
    elif "convert_element_type" in fw:
        tag = "dtype_casts"
    elif "learnable_pca_image" in fw:
        tag = "pca_contraction"
    elif "conv_head" in fw:
        tag = "conv_head"
    elif "/nn" in fw or "lin_r" in fw:
        tag = "conv_mlp"
    elif "/mul:" in fw or "/div:" in fw or "/sub:" in fw:
        tag = "edge_scale_mul"
    elif "jit(_pad)" in fw:
        tag = "pad"
    else:
        tag = "other"
    return ("bwd_" if bwd else "fwd_") + tag


def aggregate(table, iters, meta):
    """Region table from an hlo_stats row list (shared by the live path
    and --from-dump offline re-aggregation)."""

    def field(r, *names, default=0.0):
        for n in names:
            if n in r and r[n] is not None:
                return r[n]
        return default

    regions = {}
    ops = []
    total_us = 0.0
    for r in table:
        name = str(field(r, "HLO op name", default=""))
        fw = str(field(r, "Framework op name", default=""))
        cat = str(field(r, "HLO op category", default=""))
        t_us = float(field(r, "Total self time (us)", default=0.0) or 0.0)
        occ = field(r, "#Occurrences", default=0)
        if t_us <= 0:
            continue
        total_us += t_us
        region = classify(fw, cat)
        regions[region] = regions.get(region, 0.0) + t_us
        ops.append((
            t_us, name, cat, occ, fw,
            field(r, "Bound by", default=""),
            field(r, "%time stalled by DMA", default=None),
            field(r, "Measured memory BW (GiB/s)", default=None),
            field(r, "Operational intensity (FLOPS/Byte)", default=None),
        ))
    ops.sort(key=lambda t: -t[0])
    per_step = {
        k: round(v / iters / 1e3, 3)
        for k, v in sorted(regions.items(), key=lambda kv: -kv[1])
    }
    return {
        "metric": "step_region_profile",
        **meta,
        "iters": iters,
        "regions_ms_per_step": per_step,
        "total_device_ms_per_step": round(total_us / iters / 1e3, 3),
        "top_ops": [
            {"self_ms_per_step": round(t / iters / 1e3, 3), "op": n,
             "category": c, "n": o, "fw_op": f[-160:],
             "bound_by": b, "dma_stall_pct": d,
             "mem_bw_gibps": bw, "op_intensity": oi}
            for t, n, c, o, f, b, d, bw, oi in ops[:25]
        ],
    }


def main():
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.data.synthetic import make_gbm_scale_setup
    from multilevel_gnn_tpu.ops import spmm
    from multilevel_gnn_tpu.train.step import build_train_fns
    from multilevel_gnn_tpu.utils.runtime import enable_compilation_cache

    windowed = "composed" not in sys.argv[1:]
    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)
    seed = int(time.time()) % 1_000_000

    spmm.set_backend("pallas")
    spmm.set_spmm_dtype(jnp.bfloat16)
    cfg, model, graph, ctx, batch = make_gbm_scale_setup(
        topology="cohort", windowed=windowed, seed=seed, topo_seed=0,
    )
    cfg = cfg.replace(compute_dtype="bfloat16")  # the shipped trunk
    from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN

    model = MultilevelGNN(cfg)
    fns = build_train_fns(model, cfg)
    params, opt_state = fns.init_state(jax.random.PRNGKey(0), batch, ctx, 10)
    cw = jnp.ones(2, jnp.float32)
    key = jax.random.PRNGKey(1)
    batch, ctx = jax.block_until_ready(jax.device_put((batch, ctx)))

    def step(params, opt_state):
        return fns.train_step(params, opt_state, batch, ctx, cw, key)

    # warm (compile + first program load outside the trace)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state)
    _ = float(loss)

    iters = 10
    tmp = tempfile.mkdtemp(prefix="mgtpu_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state)
        _ = float(loss)
    wall_ms = (time.perf_counter() - t0) / iters * 1e3

    # honest wall reference OUTSIDE the profiler (tracing adds overhead)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state)
    _ = float(loss)
    clean_wall_ms = (time.perf_counter() - t0) / iters * 1e3

    xplanes = glob.glob(
        os.path.join(tmp, "**", "*.xplane.pb"), recursive=True
    )
    assert xplanes, f"no xplane under {tmp}"
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # gviz-style: first row may be the schema; find the data rows
    if isinstance(rows, dict):
        cols = [c["label"] for c in rows["cols"]]
        table = [
            dict(zip(cols, [c["v"] if isinstance(c, dict) else c
                            for c in r["c"]]))
            for r in rows["rows"]
        ]
    else:
        table = rows
    print(f"hlo_stats columns: {sorted(table[0].keys())}", file=sys.stderr)
    with open("/tmp/hlo_stats_full.json", "w") as f:
        json.dump(table, f)  # offline re-aggregation without re-tracing

    out = aggregate(table, iters, {"windowed": windowed})
    out["traced_wall_ms_per_step"] = round(wall_ms, 3)
    out["clean_wall_ms_per_step"] = round(clean_wall_ms, 3)
    out["dispatch_gap_ms"] = round(
        clean_wall_ms - out["total_device_ms_per_step"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    if "--from-dump" in sys.argv:
        # offline re-aggregation of a saved hlo_stats table (same data,
        # no re-trace): profile_trace.py --from-dump PATH [iters]
        i = sys.argv.index("--from-dump")
        path = sys.argv[i + 1]
        iters = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 10
        with open(path) as f:
            table = json.load(f)
        print(json.dumps(aggregate(table, iters, {"from_dump": path})))
    else:
        main()
