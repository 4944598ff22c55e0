"""Driver-side retry with exponential backoff (C1).

Re-expression of the reference's retry_with_backoff
(/root/reference/mistralocr_app.py:62-74): retry only on rate-limit
("429") errors, sleep base * 2^attempt, re-raise everything else.

Inside Spark tasks this is unnecessary — spark.task.maxFailures covers
transient task failure — but a throttling *external sink* called from
the driver (e.g. a catalog service) still wants it.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def retry_with_backoff(
    func: Callable[[], T],
    retries: int = 5,
    base_delay: float = 1.5,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    for attempt in range(retries):
        try:
            return func()
        except Exception as e:  # noqa: BLE001 — mirrors reference semantics
            if "429" in str(e):
                sleep(base_delay * (2 ** attempt))
            else:
                raise
    raise RuntimeError("failed after multiple retries")
