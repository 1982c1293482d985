"""YAML config with relative-path resolution — the reference's
ConfigParser semantics (geoEpic/io/config_parser.py:4-63): values that
look like paths ('./...', '../...') resolve relative to the config file's
directory; ``update`` writes back preserving the rest.
"""

from __future__ import annotations

import os

import yaml


class Config:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self.dir = os.path.dirname(self.path)
        with open(self.path) as f:
            self.data = yaml.safe_load(f) or {}

    def _resolve(self, value):
        if isinstance(value, str) and value.startswith(("./", "../")):
            return os.path.normpath(os.path.join(self.dir, value))
        if isinstance(value, dict):
            return {k: self._resolve(v) for k, v in value.items()}
        if isinstance(value, list):
            return [self._resolve(v) for v in value]
        return value

    def get(self, key: str, default=None):
        return self._resolve(self.data.get(key, default))

    def as_dict(self) -> dict:
        return {k: self._resolve(v) for k, v in self.data.items()}

    def update(self, updates: dict) -> None:
        """Merge + persist (config_parser.py update semantics)."""
        self.data.update(updates)
        with open(self.path, "w") as f:
            yaml.safe_dump(self.data, f, sort_keys=False)
