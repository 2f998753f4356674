"""Backoff strategies — parity with the reference's retry/backoff.rs.

Reference semantics (`/root/reference/src/retry/backoff.rs:39-65`):
``delay = min(initial * 2^attempt, max)`` then ±jitter% applied after
the cap; plus a ``FixedBackoff`` variant (`:129-151`). Defaults mirror
`src/retry/mod.rs:29-33` (100 ms → 30 s cap, multiplier 2, jitter 0.1).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field


@dataclass
class ExponentialBackoff:
    initial: float = 0.1  # seconds (reference: 100 ms)
    maximum: float = 30.0  # seconds (reference: 30 s cap)
    multiplier: float = 2.0
    jitter_factor: float = 0.1
    rng: random.Random = field(default_factory=random.Random, repr=False)

    def delay(self, attempt: int) -> float:
        """Delay before retry #attempt (attempt 0 ⇒ initial)."""
        base = min(self.initial * (self.multiplier**attempt), self.maximum)
        if self.jitter_factor <= 0:
            return base
        jitter = base * self.jitter_factor
        return max(0.0, base + self.rng.uniform(-jitter, jitter))


@dataclass
class FixedBackoff:
    interval: float = 1.0

    def delay(self, attempt: int) -> float:  # noqa: ARG002 - parity signature
        return self.interval
