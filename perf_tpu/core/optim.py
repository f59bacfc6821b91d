"""Non-finite-gradient step guard.

The reference trains every field under ``torch.cuda.amp.GradScaler``
(``modules/scene/nerf.py``: ``scaler.scale(loss).backward(); scaler.step();
scaler.update()``).  Beyond loss scaling — which plain f32 Adam absorbs —
GradScaler has a second, load-bearing behavior: ``scaler.step(opt)`` SKIPS
the optimizer step whenever any gradient is inf/NaN, so a single blown-up
batch cannot poison the parameters.

That protection matters at flagship scale: in the round-5 24-anchor record
a non-finite batch appeared at episode 20 (losses healthy at step 61800,
NaN at 61900) and, without the skip, the NaN flowed Adam -> params -> every
subsequently rendered anchor pano, corrupting the back 5 anchors.

The skip alone is NOT sufficient, though: the batch NaNs traced to a
trained-in density hotspot whose unclamped ``exp`` overflowed to inf at
~0.04% of pool rays (BASELINE.md "TRUE root cause"), so EVERY batch was
non-finite and the skip locked training at frozen params. The companion
fix is forward-finiteness in the field/renderer (trunc_exp forward clamp +
where-masks, fields/ngp.py); this guard remains as the last line of
defense against genuinely sporadic blow-ups.

TPU-native equivalent: a scalar ``all_finite(grads)`` reduction plus a
broadcasted ``where`` over the (params, opt_state) trees — no host sync, no
``lax.cond`` branch (both sides are cheap elementwise selects XLA fuses into
the update). Cost is one extra read of the gradient tree per step,
~0.2 ms against the ~50-90 ms gather-bound flagship step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every leaf of ``tree`` is finite (no NaN / +-inf)."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.bool_(True)
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = ok & jnp.isfinite(leaf).all()
    return ok


def tree_where(pred, new_tree, old_tree):
    """Per-leaf ``where(pred, new, old)`` with a scalar predicate.

    Used to commit-or-skip an optimizer update: ``pred`` is the
    ``all_finite`` verdict on the gradients; when False the old params and
    old optimizer state are kept verbatim (torch GradScaler skip semantics:
    the step never happened, Adam moments and step count untouched).
    """
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(pred, n, o), new_tree, old_tree)


def guarded_step(grads, new_params, new_opt_state, params, opt_state):
    """Commit (new_params, new_opt_state) iff all gradients are finite.

    Returns ``(params, opt_state, finite)`` where ``finite`` is the scalar
    bool verdict (callers log it so skipped steps are visible in metrics).
    """
    finite = all_finite(grads)
    return (tree_where(finite, new_params, params),
            tree_where(finite, new_opt_state, opt_state),
            finite)
