"""Shared helpers for the streaming stateful operators."""

from __future__ import annotations

_UNIT_MS = {"millisecond": 1, "second": 1000, "minute": 60_000,
            "hour": 3_600_000, "day": 86_400_000}


def interval_ms(spec: str) -> int:
    """'30 seconds' / '1 minute' → milliseconds (the duration-string
    convention shared with F.window / withWatermark)."""
    qty, unit = spec.split()
    return int(qty) * _UNIT_MS[unit.rstrip("s")]
