"""Cosine variance schedule.

TPU-native equivalent of reference `diffab_pytorch/diffusion.py:11-35`.
The schedule is a NamedTuple of device arrays (length T+1, index 0 unused by
training/sampling which draw t in [1, T]) so it can be closed over by jitted
functions and indexed with traced timesteps — the reference keeps the tables
on host CPU, forcing host round-trips per step (SURVEY.md §3.1 note).

Tables are computed in float64 on host at construction and cast once; they
are tiny ((T+1,) each) and deterministic, so no caching or checkpointing is
ever needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Variance-schedule tables, each of shape (T+1,).

    beta[0] = 0 and alpha_bar[0] = 1 by construction: t=0 is the data
    distribution.  Matches the keys of the reference's schedule dict
    (diffusion.py:28-34).
    """

    alpha: jax.Array
    alpha_bar: jax.Array
    alpha_bar_sqrt: jax.Array
    one_minus_alpha_bar_sqrt: jax.Array
    beta: jax.Array

    @property
    def T(self) -> int:
        return self.beta.shape[0] - 1


def cosine_variance_schedule(
    T: int, s: float = 8e-3, beta_max: float = 0.999, dtype=jnp.float32
) -> DiffusionSchedule:
    """Nichol & Dhariwal cosine schedule.

    f(t) = cos^2(((t/T + s)/(1 + s)) * pi/2);  alpha_bar_t = f(t)/f(0);
    beta_t = clip(1 - alpha_bar_t / alpha_bar_{t-1}, 1e-5, beta_max), beta_0 = 0.

    Semantics of reference diffusion.py:11-35 (same defaults: the model uses
    s=0.01 via DiffAb.__init__, diffab_pytorch.py:639).
    """
    t = np.arange(T + 1, dtype=np.float64)
    f_t = np.cos((t / T + s) / (1.0 + s) * np.pi / 2.0) ** 2
    alpha_bar = f_t / f_t[0]
    beta = np.concatenate(
        [np.zeros(1), np.clip(1.0 - alpha_bar[1:] / alpha_bar[:-1], 1e-5, beta_max)]
    )
    alpha = 1.0 - beta

    def dev(x):
        return jnp.asarray(x, dtype=dtype)

    return DiffusionSchedule(
        alpha=dev(alpha),
        alpha_bar=dev(alpha_bar),
        alpha_bar_sqrt=dev(np.sqrt(alpha_bar)),
        one_minus_alpha_bar_sqrt=dev(np.sqrt(1.0 - alpha_bar)),
        beta=dev(beta),
    )
