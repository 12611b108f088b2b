"""Config system.

Loads the same json5 schema as the reference pipeline
(``/root/reference/config/config.json``; loader semantics from
``/root/reference/utils/util.py:57-123``):

* json5 (comments + trailing commas allowed),
* hierarchical inheritance via a ``basic_config`` key resolved against the
  ``WORD_DIR`` env var (the reference's — misspelled but load-bearing — name,
  honoured here with ``WORK_DIR`` as a fallback),
* recursive attribute-style access with dict protocol.

Unlike the reference, configs here are immutable-by-convention pytree-able
objects and nothing mutates them at runtime (the reference overwrites
``cfg.noise_schedule`` inside DiffSVC.__init__, modules/diffsvc.py:248-252;
we derive the schedule functionally in :mod:`sampling.schedule`).
"""

from __future__ import annotations

import os
from typing import Any, Dict

try:
    import json5 as _json
except ImportError:  # pragma: no cover - json5 is available in CI
    import json as _json


class HParams:
    """Recursive attribute-access view over a nested dict.

    Behaviour-compatible with the reference's ``JsonHParams``
    (utils/util.py:92-123): attribute and item access, ``keys/items/values``,
    ``len``, ``in``. Additionally provides ``to_dict`` and a proper ``get``.
    """

    def __init__(self, **kwargs: Any) -> None:
        for k, v in kwargs.items():
            if isinstance(v, dict):
                v = HParams(**v)
            self[k] = v

    # -- dict protocol -------------------------------------------------
    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    def values(self):
        return self.__dict__.values()

    def get(self, key: str, default: Any = None) -> Any:
        return self.__dict__.get(key, default)

    def __len__(self) -> int:
        return len(self.__dict__)

    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def __setitem__(self, key: str, value: Any) -> None:
        setattr(self, key, value)

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __repr__(self) -> str:
        return f"HParams({self.__dict__!r})"

    def __eq__(self, other: object) -> bool:
        if isinstance(other, HParams):
            return self.__dict__ == other.__dict__
        return NotImplemented

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.__dict__.items():
            out[k] = v.to_dict() if isinstance(v, HParams) else v
        return out

    def replace(self, **updates: Any) -> "HParams":
        """Return a copy with top-level keys replaced (functional update)."""
        d = self.to_dict()
        d.update(updates)
        return HParams(**d)


def override_config(base: Dict[str, Any], new: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge ``new`` into ``base`` (reference: utils/util.py:57-65)."""
    for k, v in new.items():
        if isinstance(v, dict):
            base.setdefault(k, {})
            base[k] = override_config(base[k], v)
        else:
            base[k] = v
    return base


def _load_config_dict(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        cfg = _json.loads(f.read())
    if "basic_config" in cfg:
        root = os.getenv("WORD_DIR") or os.getenv("WORK_DIR") or os.path.dirname(path)
        parent = _load_config_dict(os.path.join(root, cfg["basic_config"]))
        cfg = override_config(parent, cfg)
    return cfg


def load_config(path: str) -> HParams:
    """Load a json5 config file into an :class:`HParams` tree."""
    return HParams(**_load_config_dict(path))


# Path of the reference-compatible default config bundled with this repo.
DEFAULT_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "config",
    "config.json",
)
