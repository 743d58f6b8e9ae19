"""Exponential-backoff retry — the engine's equivalent of the reference's
retry decorator semantics (``retry.py:6-44``: n tries, initial delay,
multiplicative backoff; written fresh)."""

from __future__ import annotations

import functools
import logging
import time

log = logging.getLogger(__name__)


def retry(tries: int = 4, delay_s: float = 3.0, backoff: float = 2.0, exceptions=(Exception,)):
    """Retry ``tries`` times with ``delay_s``·``backoff``^k pauses.
    Matches the reference's network-op policy (4 tries / 3 s / 2×,
    BASELINE.md row 'DB retry policy')."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            d = delay_s
            for attempt in range(1, tries + 1):
                try:
                    return fn(*args, **kwargs)
                except exceptions as e:  # noqa: BLE001 — caller picks classes
                    if attempt == tries:
                        raise
                    log.warning("retry %d/%d after %s: %s", attempt, tries, type(e).__name__, e)
                    time.sleep(d)
                    d *= backoff
            raise AssertionError("unreachable")

        return wrapped

    return deco
