"""Shared NN building blocks (reference: src/models/model.py:16-119).

Notes on reference quirks (SURVEY.md §2.6):

- The reference ``ResDNN.forward`` never feeds the block output back — each
  block reads the original ``x``, so only the **last** block's output survives
  and the effective processor depth is one block regardless of
  ``processor_hidden_layers`` (model.py:115-119).  Here ``chain=False``
  (default) reproduces that *function* by building a single block — identical
  math, without allocating 15 dead blocks' parameters.  ``chain=True`` gives a
  true residual chain.
- The reference ``MLP`` dropout branch is dead code (it would crash; its call
  sites always pass dropout=0, model.py:60-61).  Dropout lives only on the
  ResDNN output (model.py:108,118).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def activation_fn(name: str, negative_slope: float = 0.1) -> Callable:
    """str → activation (reference: model.py:16-37)."""
    name = name.lower()
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "relu":
        return jax.nn.relu
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope)
    raise NotImplementedError(name)


class MLP(nn.Module):
    """Dense stack: activation between layers, ``output_act`` on the last
    (reference: model.py:40-65; default output activation is identity)."""

    features: Sequence[int]
    activation: Callable = jax.nn.relu
    output_act: Callable = lambda x: x
    dtype: Optional[Any] = None  # compute dtype (bf16 MXU path); params stay f32

    @nn.compact
    def __call__(self, x):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}", dtype=self.dtype)(x)
            x = self.activation(x) if i < n - 1 else self.output_act(x)
        return x


class ResBlock(nn.Module):
    """``x + act(Dense(x))`` — MLP with output_act = activation, plus skip
    (reference: model.py:68-79)."""

    features: Sequence[int]
    activation: Callable = jax.nn.relu
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return x + MLP(self.features, self.activation, self.activation,
                       dtype=self.dtype)(x)


class ResDNN(nn.Module):
    """Residual MLP processor (reference: model.py:82-119).

    ``hidden_units`` is a list of per-block layer-size lists; the input dim
    must equal the first block width.  ``chain=False`` reproduces the
    reference's effective single-block behavior; dropout is applied to the
    output exactly as the reference applies ``self.dropout(out)``.
    """

    hidden_units: Sequence[Sequence[int]]
    activation: Callable = jax.nn.relu
    dropout: float = 0.0
    chain: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        blocks = self.hidden_units if self.chain else self.hidden_units[-1:]
        out = x
        for i, h in enumerate(blocks):
            inp = out if self.chain else x
            out = ResBlock(tuple(h), self.activation, dtype=self.dtype,
                           name=f"block_{i}")(inp)
        if self.dropout > 0:
            out = nn.Dropout(rate=self.dropout, deterministic=deterministic)(out)
        return out


class AttnPooling(nn.Module):
    """Softmax-of-exp attention pooling over the neighbor axis
    (reference: model.py:950-970): weights = softmax(exp(MLP(x))), pooled by
    matmul over the k axis."""

    dim: int

    @nn.compact
    def __call__(self, x):
        # x: (..., k, d) → (..., d)
        w = MLP((self.dim, 1))(x)  # ..., k, 1
        attn = jax.nn.softmax(jnp.exp(w), axis=-2)
        return jnp.sum(x * attn, axis=-2)
