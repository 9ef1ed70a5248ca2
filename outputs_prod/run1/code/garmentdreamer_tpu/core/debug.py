"""Debug/sanitizer toggles: NaN checking + failure snapshot dumps.

JAX analog of the reference's rasterizer debug machinery (reference:
diff_gaussian_rasterization/__init__.py:83-91,135-144 -- the ``debug`` flag
deep-copies kernel inputs and dumps ``snapshot_fw.dump``/``snapshot_bw.dump``
on CUDA exceptions -- and the CHECK_CUDA wrapping in rasterizer_impl.cu) plus
the NaN-check toggle SURVEY.md section 5.2 promises.

Activate with ``GD_DEBUG=1`` in the environment or ``--debug`` on the
pipeline CLI (``enable_debug()``):

* ``jax.config.jax_debug_nans`` -- every jitted program re-runs op-by-op on a
  NaN and raises at the producing primitive;
* :func:`snapshot_on_error` -- wraps a step function; on ANY exception the
  (host-transferable) array arguments dump to ``snapshot_{tag}.npz`` before
  re-raising, so failing inputs can be replayed offline.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional

import numpy as np

__all__ = ["debug_enabled", "enable_debug", "snapshot_on_error", "check_finite"]

_ENABLED = False


def debug_enabled() -> bool:
    return _ENABLED or os.environ.get("GD_DEBUG", "") not in ("", "0")


def enable_debug(on: bool = True, nan_checks: bool = True) -> None:
    """Turn the debug mode on/off process-wide."""
    global _ENABLED
    import jax

    _ENABLED = on
    if nan_checks:
        jax.config.update("jax_debug_nans", on)


def snapshot_on_error(
    fn: Callable, tag: str = "fw", out_dir: str = "."
) -> Callable:
    """Wrap ``fn``; when debug mode is on and ``fn`` raises, dump its array
    arguments to ``{out_dir}/snapshot_{tag}.npz`` and re-raise (the
    reference's snapshot_fw.dump contract)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if not debug_enabled():
            return fn(*args, **kwargs)
        try:
            return fn(*args, **kwargs)
        except Exception:
            import jax

            flat, _ = jax.tree.flatten((args, kwargs))
            arrays = {}
            for i, leaf in enumerate(flat):
                if hasattr(leaf, "shape"):
                    try:
                        arrays[f"arg{i}"] = np.asarray(leaf)
                    except Exception:
                        pass
            path = os.path.join(out_dir, f"snapshot_{tag}.npz")
            np.savez(path, **arrays)
            print(f"[debug] exception in {fn.__name__}; inputs dumped to {path}",
                  flush=True)
            raise

    return wrapped


def check_finite(tree: Any, what: str = "") -> None:
    """Host-side finite assertion over a pytree (no-op unless debug is on)."""
    if not debug_enabled():
        return
    import jax

    for i, leaf in enumerate(jax.tree.leaves(tree)):
        if hasattr(leaf, "dtype") and np.issubdtype(np.asarray(leaf).dtype, np.floating):
            a = np.asarray(leaf)
            if not np.isfinite(a).all():
                raise FloatingPointError(
                    f"non-finite values in {what or 'tree'} leaf {i}: "
                    f"{np.isnan(a).sum()} NaN / {np.isinf(a).sum()} Inf"
                )
