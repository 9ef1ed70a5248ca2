"""Configuration system: YAML -> attribute tree, dotlist CLI overrides, `${...}`
resolvers, and step-scheduled scalars.

One config system replaces the reference's four (OmegaConf+dataclasses, flat
YAML->Namespace, mmcv python configs, argparse ParamGroups -- see SURVEY.md section 5.6).
Key conventions preserved for parity:

* scheduled scalars use the ``[start_step, start_val, end_val, end_step]`` list
  convention interpreted by :func:`C` (reference: threestudio/utils/misc.py:65-86);
  a 3-list means start_step = 0; a float ``end_step`` switches interpolation to epochs.
* ``${rmspace:...}``-style resolvers and ``${a.b.c}`` interpolation as used by
  the reference YAMLs (reference: threestudio/utils/config.py:11-27).
* dotlist overrides ``a.b.c=value`` from the CLI
  (reference: threestudio/utils/config.py:98-108).
"""

from __future__ import annotations

import copy
import os
import re
from datetime import datetime
from typing import Any, Dict, Iterable, List, Optional, Union

import yaml

__all__ = ["Config", "load_config", "C", "C_max", "parse_dotlist"]


_RESOLVERS = {
    "calc_exp_lr_decay_rate": lambda factor, n: float(factor) ** (1.0 / float(n)),
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "idiv": lambda a, b: int(a) // int(b),
    "basename": lambda p: os.path.basename(p),
    "rmspace": lambda s, sub: str(s).replace(" ", sub),
    "tuple2": lambda s: [float(s), float(s)],
    "gt0": lambda s: float(s) > 0,
    "not": lambda s: not s,
    "cmaxgt0": lambda s: C_max(s) > 0,
    "cmaxgt0orcmaxgt0": lambda a, b: C_max(a) > 0 or C_max(b) > 0,
}

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


class Config(dict):
    """A dict with attribute access and recursive wrapping.

    ``cfg.system.guidance.guidance_scale`` and ``cfg["system"]["guidance"]`` are
    interchangeable. Missing attributes raise AttributeError (not KeyError) so
    ``getattr(cfg, "x", default)`` works.
    """

    def __init__(self, *args, **kwargs):
        super().__init__()
        src: Dict[str, Any] = dict(*args, **kwargs)
        for k, v in src.items():
            self[k] = _wrap(v)

    def __setitem__(self, key, value):
        super().__setitem__(key, _wrap(value))

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            else:
                return default
        return node

    def set_path(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node: Any = self
        for part in parts[:-1]:
            if not isinstance(node.get(part), dict):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = value

    def to_dict(self) -> Dict[str, Any]:
        return _unwrap(self)

    def merge_from(self, other: Union[dict, "Config"]) -> "Config":
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), dict):
                self[k].merge_from(v)
            else:
                self[k] = v
        return self


def _wrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, dict):
        return Config(v)
    if isinstance(v, (list, tuple)):
        return [_wrap(x) for x in v]
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, dict):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unwrap(x) for x in v]
    return v


def _parse_scalar(s: str) -> Any:
    """Parse a CLI override value with YAML semantics ('true' -> True, '1e-3' -> float)."""
    try:
        v = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    if isinstance(v, str):
        # YAML 1.1 only floats '1.0e-3', not '1e-3'; accept the common form too
        try:
            return float(v)
        except ValueError:
            return v
    return v


def parse_dotlist(dotlist: Iterable[str]) -> Config:
    cfg = Config()
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"dotlist override must look like a.b.c=value, got {item!r}")
        key, _, val = item.partition("=")
        cfg.set_path(key.strip(), _parse_scalar(val.strip()))
    return cfg


def _resolve_value(expr: str, root: Config) -> Any:
    """Resolve one ``${...}`` expression body: either a resolver call or a path."""
    if ":" in expr:
        name, _, argstr = expr.partition(":")
        if name in _RESOLVERS:
            args = [a for a in argstr.split(",")]
            args = [root.get_path(a, _parse_scalar(a)) for a in args]
            return _RESOLVERS[name](*args)
    val = root.get_path(expr, None)
    if val is None:
        raise KeyError(f"cannot resolve interpolation ${{{expr}}}")
    return val


def _resolve_node(node: Any, root: Config, depth: int = 0) -> Any:
    if depth > 16:
        raise RecursionError("config interpolation too deep (cycle?)")
    if isinstance(node, Config):
        for k in list(node.keys()):
            dict.__setitem__(node, k, _resolve_node(node[k], root, depth))
        return node
    if isinstance(node, list):
        return [_resolve_node(x, root, depth) for x in node]
    if isinstance(node, str):
        m = _INTERP_RE.fullmatch(node)
        if m:  # whole-string interpolation keeps the resolved type
            return _resolve_node(_resolve_value(m.group(1), root), root, depth + 1)
        if _INTERP_RE.search(node):  # embedded (possibly nested) interpolation

            def sub(mm):
                return str(_resolve_node(_resolve_value(mm.group(1), root), root, depth + 1))

            # innermost-first: substitute and re-resolve until fixed point
            return _resolve_node(_INTERP_RE.sub(sub, node), root, depth + 1)
    return node


def load_config(
    path: Optional[str] = None,
    cli_overrides: Iterable[str] = (),
    timestamp: Optional[str] = None,
    **kwargs: Any,
) -> Config:
    """Load YAML + apply dotlist overrides + kwargs + resolve interpolations.

    Mirrors the reference merge order (yaml, then CLI dotlist, then kwargs;
    reference: threestudio/utils/config.py:98-108) and fills ``trial_dir`` =
    ``exp_root_dir/tag@timestamp`` like ExperimentConfig (config.py:46-95).
    """
    cfg = Config()
    if path is not None:
        with open(path) as f:
            cfg.merge_from(yaml.safe_load(f) or {})
    cfg.merge_from(parse_dotlist(cli_overrides))
    cfg.merge_from(kwargs)
    _resolve_node(cfg, cfg)
    if "exp_root_dir" in cfg:
        if timestamp is None:
            timestamp = datetime.now().strftime("@%Y%m%d-%H%M%S")
        tag = cfg.get("tag", cfg.get("name", "run"))
        cfg.setdefault("trial_name", f"{tag}{timestamp}")
        cfg.setdefault("trial_dir", os.path.join(cfg["exp_root_dir"], cfg["trial_name"]))
    return cfg


ScheduleSpec = Union[int, float, List[Any]]


def C(value: ScheduleSpec, epoch: int, global_step: int) -> float:
    """Step/epoch-interpolated scalar schedule.

    ``value`` is either a plain number or ``[start_step, start_val, end_val,
    end_step]`` (3-list means start_step = 0). An int ``end_step`` interpolates
    on ``global_step``, a float one on ``epoch``.
    Reference semantics: threestudio/utils/misc.py:65-86.
    """
    if isinstance(value, (int, float)):
        return float(value)
    value = list(value)
    if len(value) == 3:
        value = [0] + value
    if len(value) != 4:
        raise ValueError(f"schedule list must have 3 or 4 entries, got {value}")
    start_step, start_value, end_value, end_step = value
    current = global_step if isinstance(end_step, int) else epoch
    t = max(min(1.0, (current - start_step) / (end_step - start_step)), 0.0)
    return float(start_value + (end_value - start_value) * t)


def C_max(value: ScheduleSpec) -> float:
    """Max value a schedule can reach (for gating losses on/off)."""
    if isinstance(value, (int, float)):
        return float(value)
    value = list(value)
    if len(value) == 3:
        value = [0] + value
    return float(max(value[1], value[2]))
