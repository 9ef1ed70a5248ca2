"""Checkpoint / resume for training state (params + optimizer + step).

Reference parity (SURVEY.md section 5.4): the reference has GaussianModel
``capture()/restore()`` tuples (gaussian_model.py:61-93), threestudio
``load_weights/set_resume_status`` (systems/base.py:46-58), and PLY/OBJ
snapshots -- but disables Lightning checkpointing (generate_3dgs.py:54).
Here every stage gets a uniform orbax-backed save/restore of an arbitrary
pytree, plus the per-stage artifact files (PLY/OBJ) remain the recovery
units for cross-stage idempotent restart (pipeline/launch.py --resume).
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "load_module_weights",
]


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def _pack_empty(tree: Any) -> Any:
    """orbax refuses zero-size arrays (e.g. SH rest coefficients at degree 0);
    swap them for 1-element placeholders, symmetric with :func:`_unpack_empty`."""
    import jax
    import jax.numpy as jnp

    def f(x):
        if hasattr(x, "size") and x.size == 0:
            return jnp.zeros((1,), x.dtype)
        return x

    return jax.tree_util.tree_map(f, tree)


def save_checkpoint(ckpt_dir: str, step: int, tree: Any, max_to_keep: int = 3) -> None:
    """Save a pytree (params / optimizer state / rng / counters) at ``step``."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(_pack_empty(tree)))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shapes of ``target`` (abstract template)."""
    import jax
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, _pack_empty(target)
    )
    out = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    # swap placeholder leaves back to the target's zero-size originals
    return jax.tree_util.tree_map(
        lambda o, t: t if (hasattr(t, "size") and t.size == 0) else o, out, target
    )


def load_module_weights(
    ckpt_dir: str,
    target: Any,
    module_name: Optional[str] = None,
    ignore_modules: Optional[list] = None,
    step: Optional[int] = None,
) -> Any:
    """Load only a submodule's weights from a checkpoint into ``target``.

    The reference's ``load_module_weights`` (threestudio/utils/misc.py:32-62)
    filters a flat torch state dict by key prefix; the pytree analog selects
    by the FIRST path segment: ``module_name='guidance'`` keeps only leaves
    under ``tree['guidance']`` (restored into target's matching subtree),
    while ``ignore_modules=['prompt']`` loads everything except those
    subtrees, keeping target's values there. Exactly one of the two may be
    set (misc.py:35-36 raises on both).
    """
    import jax

    if module_name is not None and ignore_modules is not None:
        raise ValueError("module_name and ignore_modules cannot be both set")
    if module_name is None and ignore_modules is None:
        return restore_checkpoint(ckpt_dir, target, step=step)
    if not isinstance(target, dict):
        raise TypeError("module filtering requires a dict-rooted pytree")

    # Partial restore (ADVICE r2): UNSELECTED subtrees restore at their
    # SAVED shapes (from checkpoint metadata) and are discarded, so a
    # checkpoint whose ignored modules mismatch the target cannot fail the
    # load -- the reference's key-prefix filter never materializes them
    # either (threestudio/utils/misc.py:32-62).
    import orbax.checkpoint as ocp

    if module_name is not None:
        selected = lambda k: k == module_name
    else:
        selected = lambda k: k not in ignore_modules

    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    step_dir = os.path.join(os.path.abspath(ckpt_dir), str(step), "default")
    ckptr = ocp.StandardCheckpointer()
    meta_tree = ckptr.metadata(step_dir).item_metadata.tree

    def saved_abstract(subtree):
        return jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype), subtree
        )

    template = {}
    for k in meta_tree:
        if selected(k) and k in target:
            template[k] = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, _pack_empty(target[k])
            )
        else:
            template[k] = saved_abstract(meta_tree[k])
    restored = ckptr.restore(step_dir, template)

    out = dict(target)
    for k in restored:
        if selected(k) and k in target:
            # swap placeholder leaves back to target's zero-size originals
            out[k] = jax.tree_util.tree_map(
                lambda o, t: t if (hasattr(t, "size") and t.size == 0) else o,
                restored[k], target[k],
            )
    return out
