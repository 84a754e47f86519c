"""Debug-mode numerical checking.

TPU-native equivalent of the (absent) sanitizer story of the reference
(SURVEY.md §5.2): checkify-instrumented step functions that turn silent
NaN/Inf/OOB into hard errors with source locations.  Zero cost when unused
— wrap only in debug runs.

Usage:
    step = harness.make_train_step(donate=False)
    checked = checked_fn(step)
    state, metrics = checked(state, batch, key)   # raises on NaN/Inf
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.experimental import checkify

CHECKS = checkify.float_checks | checkify.index_checks | checkify.div_checks


def checked_fn(fn: Callable, checks=CHECKS) -> Callable:
    """Wrap a jittable function so float/index errors raise eagerly."""
    cfn = checkify.checkify(fn, errors=checks)
    jfn = jax.jit(cfn)

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        err, out = jfn(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side finite check over a pytree (for tests and debug loops)."""
    import jax.numpy as jnp

    bad = [
        path
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        if hasattr(leaf, "dtype")
        and jnp.issubdtype(leaf.dtype, jnp.floating)
        and not bool(jnp.all(jnp.isfinite(leaf)))
    ]
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")
