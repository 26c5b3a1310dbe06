"""Static pytree leaf: carry hashable Python metadata (e.g. kernel band
half-supports) inside traced pytrees (the RL engines' per-view kernel
entry dicts) so jitted code can read it at TRACE time.

A `Static(value)` flattens to zero children with `value` as aux data, so
it participates in the jit cache key (structure) instead of becoming a
tracer. `value` must be hashable (tuples of ints here)."""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class Static:
    value: object


jax.tree_util.register_pytree_node(
    Static,
    lambda s: ((), s.value),
    lambda aux, _children: Static(aux),
)
