"""Halo-overlap schedule evidence (VERDICT r2 Next #6).

The halo design (parallel/halo.py, SURVEY §5.7) claims XLA's latency-hiding
scheduler overlaps the boundary all_to_all with the interior aggregation.
With one physical chip we cannot profile a real multi-chip schedule, but the
PRECONDITION for overlap is machine-checkable in the compiled module: the
all-to-all instruction must share no dependency path with the interior
compute — neither as ancestor nor as descendant — so the scheduler is free
to run them concurrently.  parallel/halo.py tags the interior / exchange /
boundary stages with jax.named_scope, which survives into HLO op metadata
(including inside fusions), so this module:

  1. compiles the halo step on the virtual CPU mesh,
  2. parses the optimized HLO into a def-use graph over the entry
     computation (attributing fused-computation metadata to the calling
     fusion instruction),
  3. asserts every `halo_interior`-tagged instruction is dependency-
     independent of every all-to-all(-start) instruction.

Run:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo:/root/.axon_site python tools/halo_schedule.py
"""
from __future__ import annotations

import re
from collections import defaultdict
from typing import Dict, List, Set, Tuple

# the type prefix may contain tuple types with /*index=N*/ comments
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?(%?[\w\.\-]+)\s*=\s*[\w\[\]\{\}\(\),\s\/#*=:]*?"
    r"\b([\w\-]+)\((.*)$"
)
_NAME_RE = re.compile(r"%[\w\.\-]+")
# header params can be nested tuples — only the leading name matters
_COMP_HDR_RE = re.compile(r"^(?:ENTRY\s+)?(%?[\w\.\-]+)")


def parse_hlo(text: str):
    """-> (comps: {name: [(lhs, opcode, operands, calls, meta_line)]},
          entry_name)"""
    comps: Dict[str, List[Tuple[str, str, List[str], List[str], str]]] = {}
    entry = None
    cur = None
    for line in text.splitlines():
        if line.endswith("{") and "->" in line:
            m = _COMP_HDR_RE.match(line.strip())
            if m:
                cur = m.group(1).lstrip("%")
                comps[cur] = []
                if line.strip().startswith("ENTRY"):
                    entry = cur
            continue
        if line.strip() == "}":
            cur = None
            continue
        if cur is None:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        lhs, opcode, rest = m.group(1).lstrip("%"), m.group(2), m.group(3)
        # operand list = the first balanced paren group's %names
        depth, i = 1, 0
        while i < len(rest) and depth > 0:
            if rest[i] == "(":
                depth += 1
            elif rest[i] == ")":
                depth -= 1
            i += 1
        operands = [n.lstrip("%") for n in _NAME_RE.findall(rest[: i - 1])]
        tail = rest[i:]
        calls = [
            n.lstrip("%")
            for key in ("calls=", "to_apply=", "condition=", "body=",
                        "branch_computations={")
            if key in tail
            for n in _NAME_RE.findall(
                tail.split(key, 1)[1].split(",", 1)[0]
            )
        ]
        comps[cur].append((lhs, opcode, operands, calls, tail))
    assert entry is not None, "no ENTRY computation found"
    return comps, entry


# opcodes doing real compute: if one of these is tagged interior and sits
# on the all-to-all's dependency path, the interior aggregation cannot
# overlap the exchange.  Small elementwise/index ops shared by CSE between
# the interior and boundary paths (slices, compares, constants) are noise.
_HEAVY = (
    "dot", "scatter", "custom-call", "reduce", "reduce-window",
    "convolution", "while",
)


def _comp_tags(comps, tags):
    """Transitive tag sets per computation (tags found in any instruction's
    metadata of the computation or anything it calls); a ':heavy' variant
    is added when the tagged instruction is real compute (_HEAVY)."""
    out: Dict[str, Set[str]] = {}

    def visit(name, stack=()):
        if name in out:
            return out[name]
        if name in stack:
            return set()
        acc: Set[str] = set()
        for _, opcode, _, calls, meta in comps.get(name, []):
            for t in tags:
                if t in meta:
                    acc.add(t)
                    if any(opcode.startswith(h) for h in _HEAVY):
                        acc.add(t + ":heavy")
            for c in calls:
                acc |= visit(c, stack + (name,))
        out[name] = acc
        return acc

    for name in comps:
        visit(name)
    return out


def analyze(hlo_text: str, tags=("halo_interior", "halo_exchange",
                                 "halo_boundary")):
    """-> dict with per-tag entry instruction sets, all-to-all set, and the
    overlap verdict."""
    comps, entry = parse_hlo(hlo_text)
    ctags = _comp_tags(comps, tags)

    instr_tags: Dict[str, Set[str]] = {}
    producers: Dict[str, List[str]] = {}
    a2a: Set[str] = set()
    for lhs, opcode, operands, calls, meta in comps[entry]:
        t = {tag for tag in tags if tag in meta}
        if t and any(opcode.startswith(h) for h in _HEAVY):
            t |= {tag + ":heavy" for tag in t}
        for c in calls:
            t |= ctags.get(c, set())
        instr_tags[lhs] = t
        producers[lhs] = operands
        if "all-to-all" in opcode:
            a2a.add(lhs)

    consumers = defaultdict(list)
    for lhs, ops in producers.items():
        for o in ops:
            consumers[o].append(lhs)

    def closure(seeds, edges):
        seen, stack = set(), list(seeds)
        while stack:
            n = stack.pop()
            for m in edges.get(n, []):
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        return seen

    ancestors = closure(a2a, producers)
    descendants = closure(a2a, consumers)
    interior = {n for n, t in instr_tags.items() if "halo_interior" in t}
    heavy = {n for n, t in instr_tags.items() if "halo_interior:heavy" in t}
    blocked = {
        n: ("ancestor" if n in ancestors else "descendant")
        for n in interior
        if n in ancestors or n in descendants
    }
    blocked_heavy = {n: r for n, r in blocked.items() if n in heavy}
    return {
        "entry": entry,
        "n_entry_instr": len(instr_tags),
        "all_to_all": sorted(a2a),
        "interior": sorted(interior),
        "interior_heavy": sorted(heavy),
        "boundary": sorted(
            n for n, t in instr_tags.items() if "halo_boundary" in t
        ),
        # interior-tagged instructions on the exchange's dependency path;
        # CSE-shared index math / constants land here harmlessly
        "blocked": blocked,
        # the verdict: HEAVY interior compute must be path-independent of
        # the all-to-all or the latency-hiding scheduler cannot overlap
        "blocked_heavy": blocked_heavy,
        "independent": (
            len(blocked_heavy) == 0 and bool(a2a) and bool(heavy)
        ),
    }


def compile_halo_hlo(pallas: bool = False, k: int = 4):
    """Compile the halo aggregation on the virtual CPU mesh, return
    optimized HLO text (the same fixture as tests/test_halo.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from multilevel_gnn_tpu.core.graph import Graph
    from multilevel_gnn_tpu.parallel import make_mesh
    from multilevel_gnn_tpu.parallel.halo import (
        build_halo_partition,
        halo_gather_scatter,
        pad_nodes_for,
    )

    rng = np.random.RandomState(3)
    n, intra, cross = 512, 3000, 120
    nl = n // k
    s, d = [], []
    for p in range(k):
        s.append(rng.randint(p * nl, (p + 1) * nl, size=intra // k))
        d.append(rng.randint(p * nl, (p + 1) * nl, size=intra // k))
    s.append(rng.randint(0, n, size=cross))
    d.append(rng.randint(0, n, size=cross))
    edges = np.stack([np.concatenate(s), np.concatenate(d)])
    g = Graph.from_edges(edges, rng.rand(edges.shape[1]).astype(np.float32), n)
    hp = build_halo_partition(g, k, pallas=pallas)
    mesh = make_mesh(1, k)
    x = jnp.asarray(rng.randn(2, g.n_nodes, 32).astype(np.float32))
    xp = pad_nodes_for(x, hp)
    with mesh:
        return (
            jax.jit(
                lambda x: halo_gather_scatter(x, hp, mesh, "sum", g.edge_attr)
            )
            .lower(xp)
            .compile()
            .as_text()
        )


if __name__ == "__main__":
    import json

    for pallas in (False, True):
        hlo = compile_halo_hlo(pallas=pallas)
        res = analyze(hlo)
        print(
            json.dumps(
                {
                    "backend": "pallas" if pallas else "xla",
                    "independent": res["independent"],
                    "all_to_all": res["all_to_all"],
                    "n_interior_instr": len(res["interior"]),
                    "n_boundary_instr": len(res["boundary"]),
                    "blocked": res["blocked"],
                },
                indent=2,
            )
        )
