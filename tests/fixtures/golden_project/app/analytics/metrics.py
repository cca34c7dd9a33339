"""Lightweight metrics runtime: counters, gauges, timers, and rollups.

Exercises context managers, nested classes, operator-ish helpers, and
registry-free global state with reset hooks.
"""

import time

from app.utils.formatting import humanize_duration


class Counter:
    def __init__(self, name: str):
        self.name = name
        self.value = 0

    def inc(self, by: int = 1) -> int:
        self.value += by
        return self.value

    def reset(self) -> None:
        self.value = 0


class Gauge:
    def __init__(self, name: str):
        self.name = name
        self.value = 0.0
        self.high_water = float("-inf")
        self.low_water = float("inf")

    def set(self, value: float) -> None:
        self.value = value
        self.high_water = max(self.high_water, value)
        self.low_water = min(self.low_water, value)

    def span(self) -> float:
        if self.high_water < self.low_water:
            return 0.0
        return self.high_water - self.low_water


class Timer:
    """Context manager accumulating wall time and call counts."""

    def __init__(self, name: str):
        self.name = name
        self.total_seconds = 0.0
        self.calls = 0
        self._started: float | None = None

    def __enter__(self) -> "Timer":
        self._started = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if self._started is not None:
            self.total_seconds += time.perf_counter() - self._started
            self._started = None
        self.calls += 1
        return False

    def mean_seconds(self) -> float:
        return self.total_seconds / self.calls if self.calls else 0.0

    def human_total(self) -> str:
        return humanize_duration(self.total_seconds)


class MetricsHub:
    """Owns every metric; the app creates one per process."""

    def __init__(self):
        self.counters: dict = {}
        self.gauges: dict = {}
        self.timers: dict = {}

    def counter(self, name: str) -> Counter:
        if name not in self.counters:
            self.counters[name] = Counter(name)
        return self.counters[name]

    def gauge(self, name: str) -> Gauge:
        if name not in self.gauges:
            self.gauges[name] = Gauge(name)
        return self.gauges[name]

    def timer(self, name: str) -> Timer:
        if name not in self.timers:
            self.timers[name] = Timer(name)
        return self.timers[name]

    def snapshot(self) -> dict:
        return {
            "counters": {n: c.value for n, c in self.counters.items()},
            "gauges": {n: g.value for n, g in self.gauges.items()},
            "timers": {
                n: {"calls": t.calls, "mean_s": round(t.mean_seconds(), 6)}
                for n, t in self.timers.items()
            },
        }

    def reset(self) -> None:
        for c in self.counters.values():
            c.reset()
        self.gauges.clear()
        self.timers.clear()


class Rollup:
    """Fixed-window aggregation of counter samples."""

    def __init__(self, window_seconds: float = 60.0, keep_windows: int = 60):
        self.window_seconds = window_seconds
        self.keep_windows = keep_windows
        self._buckets: dict = {}

    def record(self, ts: float, value: int = 1) -> None:
        key = int(ts // self.window_seconds)
        self._buckets[key] = self._buckets.get(key, 0) + value
        if len(self._buckets) > self.keep_windows:
            for old in sorted(self._buckets)[: -self.keep_windows]:
                del self._buckets[old]

    def rate_per_second(self, now_ts: float) -> float:
        key = int(now_ts // self.window_seconds)
        return self._buckets.get(key, 0) / self.window_seconds

    def series(self) -> list:
        return [self._buckets[k] for k in sorted(self._buckets)]

    def peak(self) -> int:
        return max(self._buckets.values(), default=0)


def instrument_service(hub: MetricsHub, service) -> None:
    """Attach request counters to a BaseService-shaped object."""
    name = getattr(service, "service_name", "unknown")
    hub.counter(f"{name}.calls")
    hub.gauge(f"{name}.queue_depth")


def summarize(hub: MetricsHub) -> str:
    snap = hub.snapshot()
    lines = [f"{n}: {v}" for n, v in sorted(snap["counters"].items())]
    lines.extend(
        f"{n}: {d['calls']} calls, {d['mean_s']*1000:.2f} ms avg"
        for n, d in sorted(snap["timers"].items()))
    return "\n".join(lines)
