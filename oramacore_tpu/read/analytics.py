"""Append-only analytics event log with claim-gated export-and-erase.

Reference: src/collection_manager/sides/read/analytics.rs —
`OramaCoreAnalytics` (:31), search events V1 with origin/type/duration/
pin-rules flag (:88), interaction events (:198), `AnalyticsHolder`
(:269), `get_and_erase` export (api analytics.rs:51).
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Dict, List, Optional


class AnalyticsLog:
    def __init__(self, path: Optional[str] = None, enabled: bool = True):
        self.path = path
        self.enabled = enabled
        self._lock = threading.Lock()
        self._fh = None
        if path and enabled:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def append(self, event: Dict[str, Any]) -> None:
        if not self.enabled:
            return
        event.setdefault("at", time.time())
        with self._lock:
            if self._fh:
                self._fh.write(json.dumps(event) + "\n")

    def add_search_event(
        self, collection: str, *, mode: str, duration_ms: float,
        has_filter: bool, has_facets: bool, has_pin_rules: bool,
        results: int, origin: str = "direct",
    ) -> None:
        self.append(
            {
                "v": 1,
                "type": "search",
                "collection": collection,
                "origin": origin,
                "mode": mode,
                "duration_ms": duration_ms,
                "has_filter": has_filter,
                "has_facets": has_facets,
                "has_pin_rules": has_pin_rules,
                "results": results,
            }
        )

    def add_interaction_event(
        self, collection: str, interaction_id: str, query: str,
        duration_ms: float,
    ) -> None:
        self.append(
            {
                "v": 1,
                "type": "interaction",
                "collection": collection,
                "interaction_id": interaction_id,
                "query": query,
                "duration_ms": duration_ms,
            }
        )

    def get_and_erase(self) -> List[Dict[str, Any]]:
        """Export all events and truncate the log (analytics.rs:51)."""
        with self._lock:
            events: List[Dict[str, Any]] = []
            if self.path and os.path.exists(self.path):
                if self._fh:
                    self._fh.flush()
                with open(self.path) as fh:
                    for line in fh:
                        line = line.strip()
                        if line:
                            try:
                                events.append(json.loads(line))
                            except json.JSONDecodeError:
                                continue
                if self._fh:
                    self._fh.close()
                self._fh = open(self.path, "w", buffering=1)
            return events

    def close(self):
        with self._lock:
            if self._fh:
                self._fh.close()
                self._fh = None
