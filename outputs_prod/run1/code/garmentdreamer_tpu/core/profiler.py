"""Hierarchical wall-clock profiler with device sync + JSON export.

TPU-native analog of the reference's deformer Profiler
(reference: Garment_Deformer_NeTF/deformer/utils/profiling.py:6-83): where the
reference calls ``torch.cuda.synchronize()``, we call
``jax.block_until_ready`` on a sentinel (or rely on the caller passing outputs
to :meth:`Profiler.end`). Also wraps ``jax.profiler`` trace capture behind the
same object so a single flag turns on XLA-level traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax

__all__ = ["Profiler", "NoOpProfiler", "get_profiler"]


@dataclass
class _Node:
    name: str
    total: float = 0.0
    count: int = 0
    children: Dict[str, "_Node"] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        d: Dict[str, Any] = {
            "total_s": self.total,
            "count": self.count,
            "mean_ms": (self.total / self.count * 1e3) if self.count else 0.0,
        }
        if self.children:
            d["children"] = {k: v.to_dict() for k, v in self.children.items()}
        return d


class Profiler:
    """Usage::

        prof = Profiler(sync=True)
        with prof.scope("train_step"):
            with prof.scope("render"):
                out = render(...)
                prof.sync_on(out)
        prof.dump_json("profile.json")
    """

    def __init__(self, sync: bool = False, xla_trace_dir: Optional[str] = None):
        self.sync = sync
        self.root = _Node("root")
        self._stack: List[_Node] = [self.root]
        self._xla_trace_dir = xla_trace_dir
        self._tracing = False

    @contextlib.contextmanager
    def scope(self, name: str):
        parent = self._stack[-1]
        node = parent.children.setdefault(name, _Node(name))
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            node.total += time.perf_counter() - t0
            node.count += 1
            self._stack.pop()

    def sync_on(self, value: Any) -> Any:
        """Block on device results so the enclosing scope measures real work."""
        if self.sync:
            jax.block_until_ready(value)
        return value

    def start_xla_trace(self) -> None:
        if self._xla_trace_dir and not self._tracing:
            jax.profiler.start_trace(self._xla_trace_dir)
            self._tracing = True

    def stop_xla_trace(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False

    def to_dict(self) -> Dict[str, Any]:
        return {k: v.to_dict() for k, v in self.root.children.items()}

    def dump_json(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    def summary(self) -> str:
        lines: List[str] = []

        def walk(node: _Node, depth: int) -> None:
            for name, child in sorted(node.children.items(), key=lambda kv: -kv[1].total):
                lines.append(
                    f"{'  ' * depth}{name}: {child.total:.3f}s x{child.count}"
                    f" ({child.total / max(child.count, 1) * 1e3:.1f} ms/it)"
                )
                walk(child, depth + 1)

        walk(self.root, 0)
        return "\n".join(lines)


class NoOpProfiler(Profiler):
    def __init__(self):
        super().__init__(sync=False)

    @contextlib.contextmanager
    def scope(self, name: str):
        yield self

    def sync_on(self, value: Any) -> Any:
        return value

    def dump_json(self, path: str) -> None:
        pass


_GLOBAL: Optional[Profiler] = None


def get_profiler() -> Profiler:
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = NoOpProfiler()
    return _GLOBAL


def set_profiler(p: Profiler) -> Profiler:
    global _GLOBAL
    _GLOBAL = p
    return p
