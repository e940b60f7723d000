"""Pytree helpers shared across the framework.

The whole engine is built on flat struct-of-arrays pytrees (``flax.struct``
dataclasses).  These helpers cover the recurring patterns:

* ``tree_stack`` / ``tree_unstack``: list-of-structs <-> struct-of-arrays
  (the TPU-native replacement for the reference's ``lob_to_soa`` /
  ``soa_to_lob``, cf. /root/reference/cotix/_utils.py:10-25).
* ``tree_select``: branchless ``jnp.where`` over whole pytrees (used for
  in-graph auto-reset and masked updates).
* ``tree_get`` / ``tree_set``: indexed gather/scatter over every leaf.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "tree_stack",
    "tree_unstack",
    "tree_select",
    "tree_get",
    "tree_set",
    "static_field",
    "tree_zeros_like",
]


def tree_stack(trees: Sequence[Any], axis: int = 0):
    """Stack a list of identically-structured pytrees into one SoA pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=axis), *trees)


def tree_unstack(tree: Any, axis: int = 0):
    """Inverse of :func:`tree_stack`: split the leading axis into a list."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    n = leaves[0].shape[axis]
    out = []
    for i in range(n):
        out.append(
            jax.tree_util.tree_unflatten(
                treedef, [jnp.take(leaf, i, axis=axis) for leaf in leaves]
            )
        )
    return out


def tree_select(pred, on_true: Any, on_false: Any):
    """``jnp.where`` broadcast over every leaf of a pytree.

    ``pred`` may be a scalar bool or an array broadcastable against each
    leaf's leading axes (extra trailing dims are added automatically).
    This is the in-graph auto-reset primitive: no ``lax.cond`` so it
    vectorizes per-lane under ``vmap``/sharding.
    """

    def _sel(t, f):
        p = pred
        extra = t.ndim - jnp.ndim(p)
        if extra > 0:
            p = jnp.reshape(p, jnp.shape(p) + (1,) * extra)
        return jnp.where(p, t, f)

    return jax.tree_util.tree_map(_sel, on_true, on_false)


def tree_get(tree: Any, idx):
    """Gather ``leaf[idx]`` for every leaf."""
    return jax.tree_util.tree_map(lambda x: x[idx], tree)


def tree_set(tree: Any, idx, value: Any):
    """Scatter ``leaf[idx] = value_leaf`` for every leaf, functionally."""
    return jax.tree_util.tree_map(lambda x, v: x.at[idx].set(v), tree, value)


def tree_zeros_like(tree: Any):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def static_field(**kwargs):
    """A dataclass field excluded from the pytree (compile-time constant)."""
    from flax import struct

    return struct.field(pytree_node=False, **kwargs)


def frozen(cls=None):
    """Decorator alias for flax.struct dataclasses used across the codebase."""
    from flax import struct

    if cls is None:
        return struct.dataclass
    return struct.dataclass(cls)
