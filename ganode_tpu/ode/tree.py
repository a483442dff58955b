"""Pytree arithmetic helpers used by the solver core.

All solver state is an arbitrary pytree; these helpers implement the small vector
algebra (axpy-style accumulation) that Runge-Kutta steppers need, without ever
materialising flattened vectors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_zeros_like(tree):
    return jax.tree.map(jnp.zeros_like, tree)


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree.map(jnp.subtract, a, b)


def tree_scale(c, tree):
    return jax.tree.map(lambda x: c * x, tree)


def tree_axpy(c, x, y):
    """y + c * x, leafwise."""
    return jax.tree.map(lambda xi, yi: yi + c * xi, x, y)


def tree_lincomb(coeffs, trees, base=None):
    """base + sum_i coeffs[i] * trees[i], leafwise.

    ``coeffs`` may be Python floats or scalar jnp arrays. ``trees`` is a sequence of
    pytrees sharing one structure. When ``base`` is None the plain linear combination
    is returned. Zero-length ``trees`` returns ``base`` unchanged.

    Each coefficient is cast to its leaf's dtype, so the state dtype governs
    the solve (torchdiffeq semantics): f32 states stay f32 even when ``ts``
    arrives as f64 (e.g. under jax_enable_x64, where a bare ``jnp.linspace``
    is f64 and would otherwise promote the solver's scan carry).
    """
    if not trees:
        return base
    def c(i, like):
        v = coeffs[i]
        return v.astype(like.dtype) if hasattr(v, "astype") else \
            jnp.asarray(v, like.dtype)
    def leaf(*leaves):
        if base is not None:
            acc = leaves[0]
            ks = leaves[1:]
        else:
            acc = c(0, leaves[0]) * leaves[0]
            ks = leaves[1:]
        offs = 0 if base is not None else 1
        for i, k in enumerate(ks):
            acc = acc + c(i + offs, k) * k
        return acc
    if base is not None:
        return jax.tree.map(leaf, base, *trees)
    return jax.tree.map(leaf, *trees)


def tree_dot(a, b):
    """Sum over all leaves of <a_i, b_i> — a full inner product."""
    leaves = jax.tree.map(lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree.reduce(jnp.add, leaves, jnp.asarray(0.0))


def tree_sq_norm(a):
    leaves = jax.tree.map(lambda x: jnp.sum(jnp.square(x)), a)
    return jax.tree.reduce(jnp.add, leaves, jnp.asarray(0.0))


def tree_inf_norm(a):
    leaves = jax.tree.map(lambda x: jnp.max(jnp.abs(x)), a)
    return jax.tree.reduce(jnp.maximum, leaves, jnp.asarray(0.0))


def tree_where(pred, a, b):
    """Select a or b leafwise based on a scalar predicate."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)
