"""Cache-blocked fleet execution: run a batched function in fixed-size
chunks inside one jit.

Why: both solver hot paths are memory-movement bound (BENCH_NOTES.md),
and their per-member working set (Jacobian slices, gain tensors, AL
multiplier stacks) is cache-resident only up to a batch knee — measured
B≈512 for the constrained isrbd fleet (9.2k solve/s at B=256 falling to
6.1k at B=4096) and B≈4096 for the unconstrained SRBD fleet. Past the
knee, every sweep streams the working set through HBM. `chunk_map`
restores cache residency at ANY fleet size by evaluating the function
over `chunk_size`-member slices sequentially via `lax.map`: each chunk's
intermediates stay at the sweet-spot size while only the (small) inputs
and outputs are materialized at full fleet width.

This is an execution strategy, not a semantic change: each member's
computation is independent (the batched solvers never mix members), so
results match the unchunked call up to floating-point reduction order
(measured ≤ 3e-16 in f64 — the reshape retiles XLA's reductions).
Throughput at fleet size B approaches the knee-batch rate independent
of B.

No reference counterpart (the reference runs one robot per process,
SURVEY.md §2.3); this is the TPU-serving analog of cache blocking.
"""

from __future__ import annotations

from typing import Callable

import jax


def chunk_map(fn: Callable, chunk_size: int) -> Callable:
    """Wrap a batched function so it evaluates in `chunk_size` slices.

    `fn` must map pytrees whose leaves all carry the fleet batch on the
    leading axis to pytrees with the same property (the contract of
    `MSDDP.solve_batch`, `ALDDP.solve_online_batch`, `MPCLoop.tick_batch`
    and friends). The fleet size must be a multiple of `chunk_size`
    (static shapes — XLA cannot tile a ragged trailing chunk; pad the
    fleet or pick a divisor).

    The chunks run sequentially (`lax.map`), so this trades nothing at
    fixed fleet size beyond per-chunk dispatch overhead — and wins
    whenever the unchunked working set exceeds what the memory hierarchy
    holds at the full batch.
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")

    def wrapped(*args):
        leaves = jax.tree.leaves(args)
        if not leaves:
            return fn(*args)
        batch = leaves[0].shape[0]
        if batch % chunk_size != 0:
            raise ValueError(
                f"fleet size {batch} is not a multiple of chunk_size "
                f"{chunk_size}"
            )
        n_chunks = batch // chunk_size
        if n_chunks == 1:
            return fn(*args)
        for leaf in leaves:
            if leaf.ndim == 0 or leaf.shape[0] != batch:
                raise ValueError(
                    "chunk_map requires every input leaf to carry the "
                    f"fleet batch ({batch}) on its leading axis; got "
                    f"shape {leaf.shape}"
                )
        split = jax.tree.map(
            lambda a: a.reshape((n_chunks, chunk_size) + a.shape[1:]), args
        )
        out = jax.lax.map(lambda chunk_args: fn(*chunk_args), split)
        return jax.tree.map(
            lambda a: a.reshape((batch,) + a.shape[2:]), out
        )

    return wrapped
