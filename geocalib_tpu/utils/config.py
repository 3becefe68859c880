"""Minimal hierarchical config: dict merge + YAML files + CLI dot-overrides.

Stands in for the reference's OmegaConf/Hydra composition
(/root/reference/siclib/train.py:727-741, models/base_model.py:25-34):
`default_conf` dicts merge down class hierarchies, then YAML, then CLI
dotlist, most-specific wins. Values are plain dicts — no extra dependency.
"""

import copy
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import yaml


def merge(*confs: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """Recursive dict merge; later arguments win."""
    out: Dict[str, Any] = {}
    for conf in confs:
        if conf is None:
            continue
        for k, v in conf.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge(out[k], v)
            else:
                out[k] = copy.deepcopy(v)
    return out


def load_yaml(path: Union[str, Path]) -> Dict[str, Any]:
    with open(path) as fh:
        return yaml.safe_load(fh) or {}


def save_yaml(conf: Dict[str, Any], path: Union[str, Path]) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        yaml.safe_dump(conf, fh, sort_keys=False)


def _parse_value(raw: str) -> Any:
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def apply_dotlist(conf: Dict[str, Any], dotlist: List[str]) -> Dict[str, Any]:
    """Apply ["a.b=3", "name=foo"]-style overrides (OmegaConf dotlist parity)."""
    out = copy.deepcopy(conf)
    for item in dotlist:
        key, _, raw = item.partition("=")
        node = out
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(raw)
    return out


def get_path(conf: Dict[str, Any], dotted: str, default: Any = None) -> Any:
    node: Any = conf
    for p in dotted.split("."):
        if not isinstance(node, dict) or p not in node:
            return default
        node = node[p]
    return node
