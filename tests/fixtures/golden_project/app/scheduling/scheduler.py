"""Recurring-job scheduler: cron-lite expressions, priorities, backoff.

Exercises comparison-heavy parsing code, heapq usage via composition,
and callable registration across modules.
"""

from app.core.exceptions import ValidationError
from app.core.registry import emit
from app.utils.dates import SECONDS_PER_DAY, now_ts


class Schedule:
    """`every:<n><unit>` or `daily@<hour>` expressions."""

    UNITS = {"s": 1, "m": 60, "h": 3600, "d": SECONDS_PER_DAY}

    def __init__(self, expression: str):
        self.expression = expression
        self.interval_seconds: float | None = None
        self.daily_hour: int | None = None
        self._parse(expression)

    def _parse(self, expression: str) -> None:
        text = (expression or "").strip().lower()
        if text.startswith("every:"):
            body = text.removeprefix("every:")
            if not body or body[-1] not in self.UNITS:
                raise ValidationError(f"bad schedule {expression!r}",
                                      field_name="schedule")
            try:
                count = float(body[:-1])
            except ValueError as exc:
                raise ValidationError(str(exc), field_name="schedule") \
                    from exc
            if count <= 0:
                raise ValidationError("interval must be positive",
                                      field_name="schedule")
            self.interval_seconds = count * self.UNITS[body[-1]]
        elif text.startswith("daily@"):
            try:
                hour = int(text.removeprefix("daily@"))
            except ValueError as exc:
                raise ValidationError(str(exc), field_name="schedule") \
                    from exc
            if not (0 <= hour <= 23):
                raise ValidationError("hour out of range",
                                      field_name="schedule")
            self.daily_hour = hour
        else:
            raise ValidationError(f"unknown schedule form {expression!r}",
                                  field_name="schedule")

    def next_after(self, ts: float) -> float:
        if self.interval_seconds is not None:
            return ts + self.interval_seconds
        day_start = ts - (ts % SECONDS_PER_DAY)
        candidate = day_start + self.daily_hour * 3600
        if candidate <= ts:
            candidate += SECONDS_PER_DAY
        return candidate


class Job:
    max_failures = 5

    def __init__(self, name: str, schedule: Schedule, action,
                 priority: int = 1):
        self.name = name
        self.schedule = schedule
        self.action = action
        self.priority = priority
        self.next_run = schedule.next_after(now_ts())
        self.failures = 0
        self.runs = 0
        self.paused = False

    def due(self, ts: float) -> bool:
        return not self.paused and ts >= self.next_run

    def record_success(self) -> None:
        self.runs += 1
        self.failures = 0
        self.next_run = self.schedule.next_after(now_ts())

    def record_failure(self) -> None:
        self.runs += 1
        self.failures += 1
        # exponential backoff, capped at one day
        delay = min(60.0 * 2 ** self.failures, SECONDS_PER_DAY)
        self.next_run = now_ts() + delay
        if self.failures >= self.max_failures:
            self.paused = True


class Scheduler:
    def __init__(self):
        self.jobs: dict = {}
        self.history: list = []

    def register(self, name: str, expression: str, action,
                 priority: int = 1) -> Job:
        job = Job(name, Schedule(expression), action, priority)
        self.jobs[name] = job
        return job

    def unregister(self, name: str) -> bool:
        return self.jobs.pop(name, None) is not None

    def due_jobs(self, ts: float | None = None) -> list:
        ts = ts if ts is not None else now_ts()
        due = [j for j in self.jobs.values() if j.due(ts)]
        return sorted(due, key=lambda j: (-j.priority, j.next_run))

    def tick(self, ts: float | None = None) -> dict:
        """Run every due job once; failures back off, not crash."""
        ran, failed = 0, 0
        for job in self.due_jobs(ts):
            try:
                job.action()
                job.record_success()
                ran += 1
            except Exception as exc:
                job.record_failure()
                failed += 1
                self.history.append(
                    {"job": job.name, "error": str(exc), "at": now_ts()})
        emit("scheduler.tick", {"ran": ran, "failed": failed})
        return {"ran": ran, "failed": failed}

    def resume(self, name: str) -> bool:
        job = self.jobs.get(name)
        if job is None or not job.paused:
            return False
        job.paused = False
        job.failures = 0
        job.next_run = job.schedule.next_after(now_ts())
        return True

    def stats(self) -> dict:
        return {
            "jobs": len(self.jobs),
            "paused": sum(1 for j in self.jobs.values() if j.paused),
            "errors": len(self.history),
        }
