"""Numerical-health checks (SURVEY.md §5 "race detection / sanitizers" row:
JAX purity + checkify for NaN checks — the TPU-native analogue of sanitizers).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def nan_checked(fn: Callable) -> Callable:
    """Wrap a jittable function with NaN/Inf + OOB checks. The wrapper raises
    ``checkify.JaxRuntimeError`` host-side when a check trips::

        step = nan_checked(train_step)
        params, opt_state, loss = step(params, ...)   # raises on NaN
    """
    checked = checkify.checkify(fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side finiteness assertion over a pytree (checkpoint hygiene)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(f"non-finite values in {name}{key}")
