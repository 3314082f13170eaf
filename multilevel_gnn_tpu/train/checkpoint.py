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


# ---- host-side loop state (results dict, numpy RNG, step counter) ----
#
# The resume contract is a PAIR per step: the orbax tree (params/opt_state)
# plus a ``step_<E>.host.npy`` sidecar with the un-jittable host state.  Both
# the sequential driver (driver.run_fold) and the fold-parallel arm
# (fold_parallel.run_experiment_foldparallel) share this schema — keep the
# keys in one place so the two drivers stay checkpoint-compatible.

HOST_STATE_KEYS = ("results", "y_true_test", "step_i", "np_rng_state")


def save_host_state(path: str, step: int, state: Dict) -> str:
    assert set(state) == set(HOST_STATE_KEYS), sorted(state)
    out = os.path.join(_ckpt_dir(path), f"step_{step}.host.npy")
    np.save(out, state, allow_pickle=True)
    return out


def load_host_state(path: str, step: int) -> Dict:
    return np.load(
        os.path.join(path, f"step_{step}.host.npy"), allow_pickle=True
    ).item()


def prune_old_steps(path: str, keep: int) -> None:
    """Delete all but the newest ``keep`` COMPLETE (tree + sidecar) steps.

    keep<=0 keeps everything.  Incomplete steps (bare orbax dir from a kill
    mid-save) newer than the retained set are left alone — they cost little
    and deleting them could race an in-flight save; stale incomplete steps
    older than the retained window are swept."""
    if keep <= 0 or not os.path.isdir(path):
        return
    import shutil

    complete, incomplete = [], []
    for d in os.listdir(path):
        if not (d.startswith("step_") and d.split("_")[1].isdigit()):
            continue
        if not os.path.isdir(os.path.join(path, d)):
            continue
        step = int(d.split("_")[1])
        if os.path.exists(os.path.join(path, f"step_{step}.host.npy")):
            complete.append(step)
        else:
            incomplete.append(step)
    complete.sort()
    retained = complete[-keep:]
    horizon = retained[0] if retained else None
    for step in complete[:-keep] if len(complete) > keep else []:
        # sidecar first: a crash mid-prune must never leave a tree-less
        # sidecar that load_host_state would pick over an older complete pair
        for f in (f"step_{step}.host.npy", f"step_{step}.loop.json"):
            p = os.path.join(path, f)
            if os.path.exists(p):
                os.remove(p)
        shutil.rmtree(os.path.join(path, f"step_{step}"), ignore_errors=True)
    for step in incomplete:
        if horizon is not None and step < horizon:
            shutil.rmtree(
                os.path.join(path, f"step_{step}"), ignore_errors=True
            )


def latest_resumable_step(path: str) -> Optional[int]:
    """Latest step with BOTH the orbax tree and the host-state sidecar.

    A kill between save_checkpoint and save_host_state leaves a bare
    ``step_<E>/`` dir; resuming from it would crash on the missing
    ``.host.npy``, so fall back to the newest complete pair."""
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(path)
        if d.startswith("step_") and d.split("_")[1].isdigit()
        and os.path.isdir(os.path.join(path, d))
        and os.path.exists(os.path.join(path, f"step_{d.split('_')[1]}.host.npy"))
    ]
    return max(steps) if steps else None
