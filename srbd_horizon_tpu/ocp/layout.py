"""Named variable layouts over flat state/input vectors.

The reference builds its state/input vectors implicitly from the order of
`createStateVariable` / `createInputVariable` calls (prb.py:32-68) and
recovers named blocks when unpacking solutions (ddp.py:125-151,
`_createVarSolDict`). Here the layout is an explicit, static object: the
solver works on flat arrays (good for XLA), and users slice by name.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp


class VarLayout:
    """An ordered mapping name -> contiguous slice of a flat vector."""

    def __init__(self, entries: List[Tuple[str, int]]):
        self.names: List[str] = [n for n, _ in entries]
        self.sizes: Dict[str, int] = dict(entries)
        self.slices: Dict[str, slice] = {}
        off = 0
        for name, size in entries:
            self.slices[name] = slice(off, off + size)
            off += size
        self.total = off

    def __contains__(self, name: str) -> bool:
        return name in self.slices

    def get(self, vec: jnp.ndarray, name: str) -> jnp.ndarray:
        """Slice `name` out of a vector (batched along leading axes)."""
        return vec[..., self.slices[name]]

    def unpack(self, vec: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Split a flat vector (or batch) into the named blocks — the
        TPU-side analog of `DDPSolver._createVarSolDict` (ddp.py:125-151)."""
        return {n: vec[..., self.slices[n]] for n in self.names}

    def pack(self, parts: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Concatenate named blocks back into a flat vector."""
        return jnp.concatenate([jnp.asarray(parts[n]) for n in self.names], axis=-1)

    def __repr__(self):
        inner = ", ".join(f"{n}:{self.sizes[n]}" for n in self.names)
        return f"VarLayout({inner}; total={self.total})"
