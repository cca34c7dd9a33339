"""Offline-sync engine: queues local mutations and reconciles conflicts.

Exercises enum-ish constants, dataclass-free record types, and a
last-writer-wins merge with version vectors.
"""

from app.core.exceptions import ConflictError
from app.db.memory import Database
from app.utils.dates import now_ts


class OpKind:
    CREATE = "create"
    UPDATE = "update"
    DELETE = "delete"


class PendingOp:
    def __init__(self, kind: str, entity_type: str, entity_id: str,
                 fields: dict | None = None):
        self.kind = kind
        self.entity_type = entity_type
        self.entity_id = entity_id
        self.fields = fields or {}
        self.queued_at = now_ts()
        self.attempts = 0

    def key(self) -> tuple:
        return (self.entity_type, self.entity_id)


class VersionVector:
    def __init__(self):
        self.clock: dict = {}

    def bump(self, replica: str) -> int:
        self.clock[replica] = self.clock.get(replica, 0) + 1
        return self.clock[replica]

    def dominates(self, other: "VersionVector") -> bool:
        for replica, count in other.clock.items():
            if self.clock.get(replica, 0) < count:
                return False
        return True

    def concurrent_with(self, other: "VersionVector") -> bool:
        return not self.dominates(other) and not other.dominates(self)

    def merge(self, other: "VersionVector") -> None:
        for replica, count in other.clock.items():
            self.clock[replica] = max(self.clock.get(replica, 0), count)


class SyncEngine:
    max_attempts = 3

    def __init__(self, db: Database, replica_id: str):
        self.db = db
        self.replica_id = replica_id
        self.pending: list = []
        self.versions: dict = {}
        self.conflicts: list = []

    def queue(self, op: PendingOp) -> None:
        # coalesce consecutive updates to the same entity
        if (self.pending and op.kind == OpKind.UPDATE
                and self.pending[-1].key() == op.key()
                and self.pending[-1].kind == OpKind.UPDATE):
            self.pending[-1].fields.update(op.fields)
            return
        self.pending.append(op)
        vector = self.versions.setdefault(op.key(), VersionVector())
        vector.bump(self.replica_id)

    def _apply(self, op: PendingOp) -> bool:
        repo = getattr(self.db, op.entity_type, None)
        if repo is None:
            raise ConflictError(f"unknown entity type {op.entity_type}")
        if op.kind == OpKind.DELETE:
            return repo._delete(op.entity_id)
        entity = repo.find(op.entity_id)
        if entity is None:
            return op.kind == OpKind.CREATE
        for field, value in op.fields.items():
            setattr(entity, field, value)
        entity.touch()
        repo.save(entity)
        return True

    def push(self) -> dict:
        """Apply every pending op; ops that keep failing park in
        `conflicts` for manual resolution."""
        applied = 0
        still_pending = []
        for op in self.pending:
            try:
                if self._apply(op):
                    applied += 1
                else:
                    raise ConflictError(f"no-op apply for {op.key()}")
            except ConflictError:
                op.attempts += 1
                if op.attempts >= self.max_attempts:
                    self.conflicts.append(op)
                else:
                    still_pending.append(op)
        self.pending = still_pending
        return {
            "applied": applied,
            "pending": len(self.pending),
            "conflicts": len(self.conflicts),
        }

    def reconcile(self, remote: "SyncEngine") -> int:
        """Merge version vectors; concurrent edits count as conflicts."""
        merged = 0
        for key, their_vector in remote.versions.items():
            mine = self.versions.get(key)
            if mine is None:
                self.versions[key] = their_vector
                merged += 1
            elif mine.concurrent_with(their_vector):
                self.conflicts.append(
                    PendingOp(OpKind.UPDATE, key[0], key[1]))
            else:
                mine.merge(their_vector)
                merged += 1
        return merged
