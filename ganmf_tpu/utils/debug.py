"""Opt-in numerics sanitizer (SURVEY §5.2 rebuild note).

The reference has no NaN/bounds debugging beyond crashing late; here
``GANMF_TPU_DEBUG=1`` re-compiles the instrumented device programs under
``jax.experimental.checkify`` float checks, so a NaN born anywhere inside
a jitted epoch (exploding loss, bad lr, poisoned input) raises a checkify
error at the step that produced it instead of silently propagating into
the saved factors.

The flag is read at call time: tests (and users) can flip it between
calls without reimporting. Both the fast and the instrumented executable
are cached per call site.
"""

from __future__ import annotations

import functools
import os

import jax


def debug_enabled() -> bool:
    return os.environ.get("GANMF_TPU_DEBUG", "0").lower() not in ("0", "", "false", "off")


def instrumented_jit(fn=None, *, static_argnames=(), donate_argnums=()):
    """Drop-in ``jax.jit`` that adds checkify float checks under
    GANMF_TPU_DEBUG=1. The debug path trades speed for a precise error
    (checkify inserts a check after every float op), so it is never the
    default."""
    if fn is None:
        return functools.partial(
            instrumented_jit, static_argnames=static_argnames, donate_argnums=donate_argnums
        )

    fast = jax.jit(fn, static_argnames=static_argnames, donate_argnums=donate_argnums)
    slow_cell = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not debug_enabled():
            return fast(*args, **kwargs)
        if "jit" not in slow_cell:
            from jax.experimental import checkify

            checked = checkify.checkify(fn, errors=checkify.float_checks)
            # no donation on the debug path: the error pytree aliases inputs
            slow_cell["jit"] = jax.jit(checked, static_argnames=static_argnames)
        err, out = slow_cell["jit"](*args, **kwargs)
        err.throw()
        return out

    wrapper._fast = fast  # introspection/testing hook
    return wrapper
