"""Engine state store — the reference's MongoDB "status" document
(``utils.py:64-91``; lock STR-2, source bookkeeping STR-1, chart-registry
map with expiry STR-4) as a single-row JSON state file.

Driver-side by design (SURVEY §2.1 SNK-4): coordination state is one tiny
record; putting it through the cluster would be ceremony. The write is
atomic (tmp + rename) so a crashed run can't half-write it; the lock is
check-and-set like the reference's double-check pattern
(``main.py:33-35,67-69``).
"""

from __future__ import annotations

import json
import os
import tempfile


class StateStore:
    def __init__(self, path: str):
        self.path = path

    # -- raw record ------------------------------------------------------
    def read(self) -> dict:
        if not os.path.exists(self.path):
            return {
                "_id": "status",
                "isUpdating": False,
                "latestSuccessfulUpdateSource": None,
                "globalCharts": {},
            }
        with open(self.path) as f:
            return json.load(f)

    def _write(self, doc: dict) -> None:
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f, sort_keys=True)
        os.replace(tmp, self.path)

    # -- STR-2: lock -----------------------------------------------------
    def try_lock(self) -> bool:
        """Check-and-set ``isUpdating`` (reference ``main.py:33-35,79``).
        Returns False when another run holds the lock."""
        doc = self.read()
        if doc.get("isUpdating"):
            return False
        doc["isUpdating"] = True
        self._write(doc)
        return True

    def unlock(self) -> None:
        doc = self.read()
        doc["isUpdating"] = False
        self._write(doc)

    # -- STR-1: source bookkeeping --------------------------------------
    def latest_source(self) -> str | None:
        return self.read().get("latestSuccessfulUpdateSource")

    def commit_source(self, source_id: str) -> None:
        """Recorded only after the serving upsert succeeds
        (reference ``main.py:326``) — the at-least-once boundary."""
        doc = self.read()
        doc["latestSuccessfulUpdateSource"] = source_id
        self._write(doc)

    # -- STR-4: chart registry map with expiry ---------------------------
    def register_chart(self, date_key: str, chart_id: str) -> None:
        doc = self.read()
        doc.setdefault("globalCharts", {})[date_key] = chart_id
        self._write(doc)

    def expire_charts(self, earliest_valid_date: str) -> list[str]:
        """Drop ``globalCharts`` keys older than the earliest valid chart
        date (reference ``main.py:353-359``). Returns expired keys."""
        doc = self.read()
        charts = doc.setdefault("globalCharts", {})
        expired = [k for k in charts if k < earliest_valid_date]
        for k in expired:
            del charts[k]
        self._write(doc)
        return expired
