"""bfloat16-compressed reverse-mode residuals.

The diff-mode bounce scan saves ~2.5 GB of f32 residuals per
CornellBox-bench step (DESIGN.md §10); every structural alternative
(remat policies, cond-skip, diff cascade) measured slower than saving
everything.  The remaining residual lever is PRECISION: store the
saved intermediates in bfloat16 and upcast when the transposed sweep
reads them — halving both the forward residual write and the backward
read traffic.

Mechanism: ``compressed_fn(fn)`` wraps a pure function in
``jax.custom_vjp`` whose forward rule runs ``jax.vjp(fn, *args)``,
hoists the vjp closure's captured residual arrays into explicit
constants via ``jax.closure_convert``, and stores large f32 constants
as bf16.  The backward rule upcasts and applies the converted linear
function.  The converted function itself is deterministic for a given
``fn`` + argument avals, so it is cached at trace time keyed by the
residual/cotangent avals (the forward rule always traces before the
backward in a process, and ahead-of-time compile caches store HLO, not
Python, so the side table never goes stale).

ACCURACY CONTRACT (this is an opt-in lossy mode): the primal forward
pass is BITWISE UNCHANGED (fn runs in f32; only what is *saved for
the backward* is rounded).  Gradients are computed from bf16-rounded
intermediates (8-bit mantissa): expect relative gradient error up to
~1e-2 on well-conditioned reductions.  tests/test_grad.py pins the
contract (finite-difference checks pass at the documented tolerances;
grads allclose to the f32-residual grads at rtol=2e-2).  Not suitable
when bitwise gradient reproducibility across modes is required.

Integer/bool inputs and outputs ride through unchanged; their
cotangents are float0 zeros per the custom_vjp contract.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# residual arrays at least this many elements get stored as bf16
# (small ones aren't worth the cast ops)
MIN_COMPRESS_ELEMS = 1 << 15

_CONVERTED = {}  # (wrapper token, avals key) -> converted_fn
_NEXT_TOKEN = [0]  # per-compressed_fn identity (see compressed_fn)


def _is_float32(x):
    return hasattr(x, "dtype") and x.dtype == jnp.float32


def _compress(c):
    if _is_float32(c) and c.size >= MIN_COMPRESS_ELEMS:
        return c.astype(jnp.bfloat16)
    return c


def _decompress(c):
    if hasattr(c, "dtype") and c.dtype == jnp.bfloat16:
        return c.astype(jnp.float32)
    return c


def _ct_example(out):
    """Cotangent example matching ``out``: zeros for inexact leaves,
    float0 zeros for int/bool leaves (what jax.vjp's function takes)."""
    def one(x):
        if jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros(x.shape, x.dtype)
        return np.zeros(x.shape, jax.dtypes.float0)

    return jax.tree.map(one, out)


def _avals_key(tree):
    leaves, treedef = jax.tree.flatten(tree)

    def dt(x):
        d = getattr(x, "dtype", None)
        if d is None:
            d = np.result_type(x)
        # float0 reprs differ between the np zeros the forward builds
        # and the cotangent leaves the transpose passes — normalize
        return "float0" if d == jax.dtypes.float0 else np.dtype(d).name

    return treedef, tuple((np.shape(x), dt(x)) for x in leaves)


def _zero_cotangent(x):
    """Zero cotangent for a primal leaf (float0 for int/bool)."""
    if jnp.issubdtype(jnp.result_type(x), jnp.inexact):
        return jnp.zeros(jnp.shape(x), jnp.result_type(x))
    return np.zeros(np.shape(x), jax.dtypes.float0)


def _hoist_all(f, ct_example):
    """Like jax.closure_convert, but hoists EVERY captured constant.

    closure_convert partitions via _maybe_perturbed and leaves int /
    bool tracers (the discrete hit-search residuals) baked inside the
    returned function's jaxpr — a tracer leak once the backward rule
    runs in a later trace.  Here the whole const list is hoisted, so
    the returned callable is pure given (cotangent, *consts).
    """
    ct_flat, ct_tree = jax.tree.flatten(ct_example)
    store = {}

    def f_flat(*leaves):
        out = f(jax.tree.unflatten(ct_tree, list(leaves)))
        flat, tree = jax.tree.flatten(out)
        store["out_tree"] = tree
        return flat

    closed = jax.make_jaxpr(f_flat)(*ct_flat)
    jaxpr, consts = closed.jaxpr, closed.consts
    out_tree = store["out_tree"]

    def converted(ct, *consts):
        leaves = jax.tree.flatten(ct)[0]
        out_flat = jax.core.eval_jaxpr(jaxpr, list(consts), *leaves)
        return jax.tree.unflatten(out_tree, out_flat)

    return converted, list(consts)


def compressed_fn(fn):
    """Wrap pure ``fn(*args) -> out`` so reverse-mode residuals are
    stored in bfloat16.  Primal outputs are bitwise ``fn``'s."""

    # per-wrapper identity in the cache key: two compressed_fn-wrapped
    # functions with IDENTICAL residual/cotangent avals but different
    # logic (e.g. same-shape renders with different rr_start closed
    # over, both traced before either backward) must not collide —
    # an aval-only key let the second forward overwrite the first's
    # entry, silently applying the wrong linear function in backward
    token = _NEXT_TOKEN[0]
    _NEXT_TOKEN[0] += 1

    @jax.custom_vjp
    def g(*args):
        return fn(*args)

    def g_fwd(*args):
        out, vjp = jax.vjp(fn, *args)
        ct_ex = _ct_example(out)
        converted, consts = _hoist_all(vjp, ct_ex)
        key = (token, _avals_key((ct_ex, tuple(consts))))
        # only the converted linear function and static metadata go in
        # the side table — the ARRAYS themselves are the residuals.
        # Saving `args` too would force every input saved alongside.
        _CONVERTED[key] = converted
        return out, tuple(_compress(c) for c in consts)

    def g_bwd(consts_c, ct):
        consts = [_decompress(c) for c in consts_c]
        key = (token, _avals_key((ct, tuple(consts))))
        converted = _CONVERTED.get(key)
        if converted is None:
            raise RuntimeError(
                "compressed_fn backward saw residual avals its forward "
                "never produced — fwd/bwd trace mismatch"
            )
        return tuple(converted(ct, *consts))

    g.defvjp(g_fwd, g_bwd)
    return g
