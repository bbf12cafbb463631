"""Shared helpers for the streaming stateful operators."""

from __future__ import annotations

_UNIT_MS = {"millisecond": 1, "milli": 1, "ms": 1,
            "second": 1000, "sec": 1000, "s": 1000,
            "minute": 60_000, "min": 60_000, "m": 60_000,
            "hour": 3_600_000, "h": 3_600_000,
            "day": 86_400_000, "d": 86_400_000,
            "week": 604_800_000, "w": 604_800_000}


def interval_ms(spec: str) -> int:
    """Duration string → milliseconds, accepting the same forms
    ``withWatermark`` / ``F.window`` do: single ('30 seconds',
    '500 millis', '1 week') and compound ('1 hour 30 minutes')
    quantity-unit pairs.  Raises ValueError naming the supported units
    on anything else — a bad spec should fail at query BUILD time with
    a message, not as a KeyError inside a stateful operator."""
    parts = spec.strip().split()
    if not parts or len(parts) % 2:
        raise ValueError(
            f"bad duration {spec!r}: expected '<n> <unit>' pairs, e.g. "
            "'30 seconds', '1 hour 30 minutes'")
    total = 0
    for qty, unit in zip(parts[::2], parts[1::2]):
        u = unit.lower()
        # exact units win before plural-stripping ('ms' must not strip
        # to 'm' = minute); strip 's' only when the singular is known
        if u not in _UNIT_MS and u.endswith("s") and u[:-1] in _UNIT_MS:
            u = u[:-1]
        if u not in _UNIT_MS:
            raise ValueError(
                f"bad duration {spec!r}: unknown unit {unit!r} "
                f"(supported: week day hour minute second millisecond "
                "and their plurals/abbreviations)")
        try:
            n = int(qty)
        except ValueError:
            raise ValueError(
                f"bad duration {spec!r}: quantity {qty!r} must be an "
                "integer (Spark's interval grammar has no fractions — "
                "use a smaller unit)") from None
        total += n * _UNIT_MS[u]
    return total
