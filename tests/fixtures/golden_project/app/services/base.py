"""Service layer base: every use-case class derives from BaseService.

Exercises dependency injection by constructor, protected helpers called
via self, and the audit/emit side channels.
"""

from app.core.registry import emit
from app.db.memory import Database
from app.models.user import User


class BaseService:
    service_name = "base"

    def __init__(self, db: Database):
        self.db = db
        self.events_emitted = 0

    def _emit(self, event: str, payload: dict) -> None:
        self.events_emitted += emit(f"{self.service_name}.{event}", payload)

    def _require_actor(self, actor: User, action: str) -> User:
        actor.require(action)
        return actor

    def health(self) -> dict:
        return {
            "service": self.service_name,
            "events_emitted": self.events_emitted,
            "storage": self.db.stats(),
        }


class ReadOnlyService(BaseService):
    """Services that never mutate; adds caching of query results."""

    service_name = "readonly"

    def __init__(self, db: Database):
        super().__init__(db)
        self._cache: dict = {}

    def cached(self, key: str, compute):
        if key not in self._cache:
            self._cache[key] = compute()
        return self._cache[key]

    def invalidate(self, key: str | None = None) -> None:
        if key is None:
            self._cache.clear()
        else:
            self._cache.pop(key, None)
