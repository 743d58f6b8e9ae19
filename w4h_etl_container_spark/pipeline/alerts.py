"""Failure alerting — the ops surface behind the reference's SMS alerts
(``utils.py:15-30`` ``text_alert`` via the textbelt HTTP API, raised from
scrape/load failures at ``main.py:48-49,57-58``).

The engine keeps the same contract — "a human finds out when the job
fails, and the failure still raises" — behind a pluggable sink registry
instead of a hard-wired SMS vendor:

* ``alert(msg)`` fans out to every registered sink, never raises out of a
  sink (a broken pager must not mask the original failure), and always
  appends to the durable JSONL alert log (the audit trail the reference
  lacked — its alert died if the HTTP call did).
* deployments register their channel with ``register_sink`` (SMS
  webhook, Slack, PagerDuty — anything callable); tests register a list
  appender.
* ``alert_on_failure`` wraps a job stage: on exception it alerts with
  the stage name and re-raises — the reference's ``text_alert`` +
  ``raise`` shape.
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections.abc import Callable

log = logging.getLogger(__name__)

_SINKS: list[Callable[[str], None]] = []
_LOG_PATH: str | None = None


def configure_log(path: str) -> None:
    """Point the durable JSONL alert log somewhere (e.g. the job work
    dir). Unset → log-only via logging."""
    global _LOG_PATH
    _LOG_PATH = path


def register_sink(sink: Callable[[str], None]) -> None:
    _SINKS.append(sink)


def clear_sinks() -> None:
    _SINKS.clear()


def alert(message: str, *, context: dict | None = None) -> None:
    """Fan a failure message out to every sink + the durable log. Sink
    errors are swallowed (logged) — alerting must never mask the
    original failure."""
    record = {"ts": time.time(), "message": message, **(context or {})}
    log.error("ALERT: %s", message)
    if _LOG_PATH:
        try:
            os.makedirs(os.path.dirname(_LOG_PATH) or ".", exist_ok=True)
            with open(_LOG_PATH, "a") as f:
                f.write(json.dumps(record, sort_keys=True, default=str) + "\n")
        except OSError as e:  # pragma: no cover — disk-full path
            log.error("alert log write failed: %s", e)
    for sink in list(_SINKS):
        try:
            sink(message)
        except Exception as e:  # noqa: BLE001 — sink failures must not propagate
            log.error("alert sink %r failed: %s", sink, e)


def alert_on_failure(stage: str):
    """Decorator: on exception, alert with the stage name and re-raise
    (the reference's text_alert-then-raise contract)."""

    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except Exception as e:
                alert(f"{stage} failed: {type(e).__name__}: {e}", context={"stage": stage})
                raise

        return wrapped

    return deco
