"""Time helpers kept dependency-free (no external tz libraries)."""

import time

SECONDS_PER_DAY = 86400


def now_ts() -> float:
    return time.time()


def days_between(start_ts: float, end_ts: float) -> float:
    return max(0.0, (end_ts - start_ts) / SECONDS_PER_DAY)


def add_days(ts: float, days: float) -> float:
    return ts + days * SECONDS_PER_DAY


def start_of_day(ts: float) -> float:
    return ts - (ts % SECONDS_PER_DAY)


def is_same_day(a_ts: float, b_ts: float) -> bool:
    return start_of_day(a_ts) == start_of_day(b_ts)


def business_days_until(due_ts: float, from_ts: float | None = None) -> int:
    """Approximate business days (skips weekends by 5/7 scaling)."""
    from_ts = from_ts if from_ts is not None else now_ts()
    raw = days_between(from_ts, due_ts)
    return int(raw * 5 / 7)


def format_relative(ts: float, reference: float | None = None) -> str:
    reference = reference if reference is not None else now_ts()
    delta = reference - ts
    if delta < 0:
        return "in the future"
    if delta < 90:
        return "just now"
    if delta < 3600:
        return f"{int(delta // 60)} minutes ago"
    if delta < SECONDS_PER_DAY:
        return f"{int(delta // 3600)} hours ago"
    return f"{int(delta // SECONDS_PER_DAY)} days ago"
