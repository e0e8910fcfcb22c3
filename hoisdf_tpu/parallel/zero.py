"""ZeRO-style sharded train state over the data mesh.

The reference's only parallelism is single-process DataParallel
(``common/base.py:103``), which replicates params, gradients, AND the AdamW
moments on every GPU.  On a TPU mesh the GSPMD equivalent of
ZeRO-1 / fully-sharded data parallel falls out of sharding *annotations*
alone: placing the optimizer moments (and optionally the params) with one
dimension sharded over the ``data`` axis makes XLA partition the elementwise
optimizer update and insert the reduce-scatter / all-gather collectives over
ICI — no manual collective calls.

Memory per chip on an N-way mesh (P = param bytes):

* replicated DP          : P params + 2P moments (+P grads transient)
* ZeRO-1 (default here)  : P params + 2P/N moments
* + ``shard_params=True``: P/N params + 2P/N moments (FSDP; XLA all-gathers
  each layer's params on use)

Sharding rule: the largest dimension divisible by the mesh axis size is
sharded; arrays smaller than ``min_size`` elements (biases, scalars, BN
stats, schedule counters) stay replicated — sharding them would trade
per-op latency for no meaningful memory.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(x: Any, n: int, axis: str, min_size: int) -> P:
    shape = getattr(x, "shape", ())
    size = getattr(x, "size", 0)
    if not shape or size < min_size:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % n == 0:
            return P(*(axis if i == d else None for i in range(len(shape))))
    return P()


def state_shardings(
    state,
    mesh: Mesh,
    *,
    shard_params: bool = False,
    data_axis: str = "data",
    min_size: int = 8192,
):
    """A ``TrainState``-shaped pytree of ``NamedSharding`` leaves.

    Optimizer moments are sharded (ZeRO-1); params too when
    ``shard_params=True`` (FSDP).  ``step`` and ``batch_stats`` (small,
    mutated by the fwd pass) stay replicated.
    """
    n = mesh.shape[data_axis]
    repl = NamedSharding(mesh, P())

    def rule(x):
        return NamedSharding(mesh, _spec_for(x, n, data_axis, min_size))

    return state.replace(
        step=repl,
        params=jax.tree.map(rule if shard_params else (lambda _: repl),
                            state.params),
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=jax.tree.map(rule, state.opt_state),
    )


def shard_state(
    state,
    mesh: Mesh,
    *,
    shard_params: bool = False,
    data_axis: str = "data",
    min_size: int = 8192,
):
    """Place a (host or replicated) train state onto the mesh with ZeRO
    shardings.  Returns ``(sharded_state, shardings)``; pass the shardings to
    ``make_train_step(state_shardings=...)`` so each step's output keeps the
    layout."""
    sh = state_shardings(
        state, mesh, shard_params=shard_params, data_axis=data_axis,
        min_size=min_size,
    )
    return jax.device_put(state, sh), sh
