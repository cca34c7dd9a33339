"""Audit trail: structured event capture with queryable history.

Subscribes to registry events and records them; exercises the decorator
event system from the consuming side plus windowed queries.
"""

from app.core.registry import handles, register_service
from app.db.memory import Database
from app.services.base import ReadOnlyService
from app.utils.dates import now_ts

_global_trail: list = []


@handles("tasks.created")
def _on_task_created(payload: dict) -> None:
    _global_trail.append({
        "at": now_ts(), "event": "tasks.created", **payload})


@handles("tasks.transitioned")
def _on_task_transitioned(payload: dict) -> None:
    _global_trail.append({
        "at": now_ts(), "event": "tasks.transitioned", **payload})


@handles("users.registered")
def _on_user_registered(payload: dict) -> None:
    _global_trail.append({
        "at": now_ts(), "event": "users.registered", **payload})


def reset_trail() -> None:
    _global_trail.clear()


@register_service("audit")
class AuditService(ReadOnlyService):
    service_name = "audit"

    def __init__(self, db: Database):
        super().__init__(db)

    def recent(self, limit: int = 50) -> list:
        return _global_trail[-limit:]

    def by_event(self, event: str) -> list:
        return [e for e in _global_trail if e["event"] == event]

    def by_actor(self, username: str) -> list:
        return [e for e in _global_trail if e.get("by") == username]

    def within(self, seconds: float) -> list:
        cutoff = now_ts() - seconds
        return [e for e in _global_trail if e["at"] >= cutoff]

    def activity_summary(self) -> dict:
        counts: dict = {}
        for entry in _global_trail:
            counts[entry["event"]] = counts.get(entry["event"], 0) + 1
        return counts

    def busiest_actor(self) -> str | None:
        tally: dict = {}
        for entry in _global_trail:
            actor = entry.get("by")
            if actor:
                tally[actor] = tally.get(actor, 0) + 1
        if not tally:
            return None
        return max(tally.items(), key=lambda kv: kv[1])[0]
