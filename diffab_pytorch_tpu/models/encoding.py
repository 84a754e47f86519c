"""Angular (NeRF-style) positional encoding of dihedral angles.

TPU-native equivalent of reference `diffab_pytorch/diffab_pytorch.py:20-54`
(AngularEncoding).  A pure function — there are no parameters, so a module
wrapper would only add ceremony.  Frequency bands are [1..n] ∪ [1, 1/2, ...,
1/n] and the output is concat([x, sin(f x), cos(f x)]) flattened over the
last two dims, giving d_in * (4 n + 1) features (reference :24-30).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def angular_encoding_dim(d_in: int, num_funcs: int = 3) -> int:
    return d_in * (num_funcs * 4 + 1)


def angular_encode(x: jax.Array, num_funcs: int = 3) -> jax.Array:
    """(..., d_in) -> (..., d_in * (4 num_funcs + 1))."""
    freqs = np.concatenate(
        [np.arange(1, num_funcs + 1), 1.0 / np.arange(1, num_funcs + 1)]
    ).astype(np.float32)
    freqs = jnp.asarray(freqs, dtype=x.dtype)
    fx = x[..., None] * freqs  # (..., d_in, 2 num_funcs)
    enc = jnp.concatenate([x[..., None], jnp.sin(fx), jnp.cos(fx)], axis=-1)
    return enc.reshape(*x.shape[:-1], -1)


def beta_encode(beta: jax.Array) -> jax.Array:
    """Timestep (variance) encoding [beta, sin beta, cos beta] — reference
    diffab_pytorch.py:584."""
    return jnp.stack([beta, jnp.sin(beta), jnp.cos(beta)], axis=-1)
