"""Storage abstractions: repository protocol + base implementation.

Exercises abstract base classes, generics-by-convention, and the
template-method pattern the services build on.
"""

from app.core.exceptions import NotFoundError, StorageError


class Repository:
    """Abstract repository; subclasses provide the storage primitive."""

    entity_name = "entity"

    def _load(self, entity_id: str):
        raise NotImplementedError

    def _store(self, entity_id: str, entity) -> None:
        raise NotImplementedError

    def _delete(self, entity_id: str) -> bool:
        raise NotImplementedError

    def _scan(self):
        raise NotImplementedError

    # -- public API built on the primitives --

    def get(self, entity_id: str):
        entity = self._load(entity_id)
        if entity is None:
            raise NotFoundError(self.entity_name, entity_id)
        return entity

    def find(self, entity_id: str):
        """Like get, but returns None instead of raising."""
        return self._load(entity_id)

    def save(self, entity) -> None:
        entity.validate()
        self._store(entity.id, entity)

    def delete(self, entity_id: str) -> None:
        if not self._delete(entity_id):
            raise NotFoundError(self.entity_name, entity_id)

    def all(self) -> list:
        return list(self._scan())

    def count(self) -> int:
        return sum(1 for _ in self._scan())

    def where(self, predicate) -> list:
        return [e for e in self._scan() if predicate(e)]

    def exists(self, entity_id: str) -> bool:
        return self._load(entity_id) is not None


class UnitOfWork:
    """Batches saves and flushes them atomically-ish."""

    def __init__(self):
        self._pending: list = []
        self.flushed = 0

    def enlist(self, repo: Repository, entity) -> None:
        self._pending.append((repo, entity))

    def flush(self) -> int:
        done = 0
        try:
            for repo, entity in self._pending:
                repo.save(entity)
                done += 1
        except Exception as exc:
            raise StorageError(
                f"flush failed after {done} writes: {exc}") from exc
        finally:
            self._pending = self._pending[done:]
            self.flushed += done
        return done

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.flush()
        return False
