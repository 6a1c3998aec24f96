"""Runtime invariant checks via ``jax.experimental.checkify``.

The reference relies on inline asserts for NaN guards and range checks
(SURVEY.md §4: data.py:126,158, model.py:763, simulators.py:349,745).  Under
``jit`` Python asserts cannot observe values; ``checkify`` threads functional
error state through the compiled program instead.  Wrap any jittable step
with :func:`checked` during debugging; production paths run unchecked.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def assert_finite(x: jax.Array, name: str) -> None:
    """Functional NaN/Inf guard (use inside a ``checked`` function)."""
    checkify.check(jnp.all(jnp.isfinite(x)), f"non-finite values in {name}")


def assert_probability(x: jax.Array, name: str) -> None:
    """Range check mirroring the reference's collision-probability assert
    (simulators.py:349)."""
    checkify.check(
        jnp.all((x >= 0) & (x <= 1)), f"{name} outside [0, 1]"
    )


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap ``fn`` with checkify (+jit): the wrapper raises the first failed
    check eagerly on the host."""
    cfn = checkify.checkify(fn, errors=checkify.user_checks | checkify.nan_checks)
    if jit:
        cfn = jax.jit(cfn)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
