"""Base model machinery: identity, timestamps, validation protocol.

The inheritance root for every domain entity; exercises classmethods,
staticmethods, properties, and abstract-ish template methods.
"""

import itertools
import time

from app.core.exceptions import ValidationError

_id_counter = itertools.count(1)


def next_id(prefix: str) -> str:
    return f"{prefix}-{next(_id_counter):06d}"


class Entity:
    """Root of the model hierarchy."""

    id_prefix = "ent"

    def __init__(self, entity_id: str | None = None):
        self.id = entity_id or next_id(self.id_prefix)
        self.created_at = time.time()
        self.updated_at = self.created_at

    def touch(self) -> None:
        self.updated_at = time.time()

    def validate(self) -> None:
        """Template method: subclasses extend via super().validate()."""
        if not self.id:
            raise ValidationError("missing id", field_name="id")

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "created_at": self.created_at,
            "updated_at": self.updated_at,
        }

    @classmethod
    def type_name(cls) -> str:
        return cls.__name__.lower()

    @staticmethod
    def clamp(value: int, low: int, high: int) -> int:
        return max(low, min(high, value))


class NamedEntity(Entity):
    """Entities with a display name and free-text description."""

    max_name_length = 120

    def __init__(self, name: str, description: str = "",
                 entity_id: str | None = None):
        super().__init__(entity_id)
        self.name = name
        self.description = description

    def validate(self) -> None:
        super().validate()
        if not self.name or not self.name.strip():
            raise ValidationError("name required", field_name="name")
        if len(self.name) > self.max_name_length:
            raise ValidationError(
                f"name longer than {self.max_name_length}",
                field_name="name")

    def rename(self, new_name: str) -> None:
        self.name = new_name
        self.touch()
        self.validate()

    def to_dict(self) -> dict:
        data = super().to_dict()
        data["name"] = self.name
        data["description"] = self.description
        return data

    @property
    def slug(self) -> str:
        return self.name.lower().replace(" ", "-")[:40]


class AuditLog:
    """Append-only change log attached to entities."""

    def __init__(self):
        self.entries: list = []

    def record(self, actor: str, action: str, detail: str = "") -> None:
        self.entries.append({
            "at": time.time(),
            "actor": actor,
            "action": action,
            "detail": detail,
        })

    def by_actor(self, actor: str) -> list:
        return [e for e in self.entries if e["actor"] == actor]

    def tail(self, n: int = 10) -> list:
        return self.entries[-n:]
