"""Numerical-health guards: non-finite detection + checkify debug wrapper.

The reference has no sanitizers (SURVEY.md §5 — it leans on ``nan_to_num`` at
intern/ray.py:55,187 and eps padding); on TPU the equivalents are (a) cheap
on-device finite-ness reductions that ride along with training, and (b) a
``jax.experimental.checkify`` wrapper for interactive debugging of where a
NaN/Inf first appears.

Note the renderer *intentionally* produces transient NaNs that are immediately
sanitized (distance = sum(w*t)/acc with acc==0, core/rendering.py:43-44), so
checkify's float_checks will flag those benign sites too — use
:func:`count_nonfinite` for production guards and checkify only to localize a
real divergence.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def count_nonfinite(tree) -> jnp.ndarray:
    """Total count of non-finite (NaN/Inf) scalars across a pytree.

    A single fused reduction per leaf; cheap enough to run every step on the
    training state. Returns an int32 scalar (device array).
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return jnp.zeros((), jnp.int32)
    counts = [jnp.sum(~jnp.isfinite(x)).astype(jnp.int32) for x in leaves]
    return jnp.sum(jnp.stack(counts))


def first_nonfinite_paths(tree, max_report: int = 8):
    """Host-side: names of leaves containing non-finite values (for error
    messages after :func:`count_nonfinite` fires)."""
    bad = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = jax.device_get(leaf)
        if hasattr(arr, "dtype") and jnp.issubdtype(arr.dtype, jnp.floating):
            import numpy as np

            n = int(np.sum(~np.isfinite(arr)))
            if n:
                bad.append(f"{jax.tree_util.keystr(path)}: {n} non-finite")
                if len(bad) >= max_report:
                    break
    return bad


class NonFiniteError(RuntimeError):
    pass


def assert_tree_finite(tree, context: str = ""):
    """Host-sync check: raise :class:`NonFiniteError` naming the bad leaves."""
    if int(jax.device_get(count_nonfinite(tree))):
        detail = "; ".join(first_nonfinite_paths(tree))
        raise NonFiniteError(f"non-finite values {context}: {detail}")


def checkify_fn(fn, *, errors=None):
    """Wrap ``fn`` with checkify for debugging. Returns ``wrapped(*args)`` that
    raises on the FIRST NaN/Inf/div-by-zero/OOB inside the traced program,
    pointing at the producing op. Compiles separately from the production path
    (checkify inserts error plumbing) — debug tool, not for the hot loop."""
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.index_checks

    checked = checkify.checkify(fn, errors=errors)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped
