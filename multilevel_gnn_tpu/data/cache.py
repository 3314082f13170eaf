"""Content-addressed preprocessing cache (SURVEY.md §5.4).

Replaces reference utils/cache_data.py:19-48 (pickle cache of MI masks /
PCA components / edges keyed by a (patient_ids, cancer_type) tuple in
idx_book.pkl) with sha256 content keys — no index bookkeeping, safe
against collisions and stale entries.
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Optional


def content_key(*parts) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
    return h.hexdigest()[:32]


class PreprocessCache:
    def __init__(self, root: str = "./data_cache"):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key + ".pkl")

    def get(self, key: str) -> Optional[Any]:
        p = self._path(key)
        if os.path.exists(p):
            with open(p, "rb") as f:
                return pickle.load(f)
        return None

    def put(self, key: str, value: Any) -> None:
        tmp = self._path(key) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(value, f)
        os.replace(tmp, self._path(key))
