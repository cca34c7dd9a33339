"""In-memory repository implementations used by tests and the demo CLI.

Subclasses of the abstract Repository; exercises inheritance across
modules and constructor-time index building.
"""

from app.db.base import Repository
from app.models.project import Project
from app.models.task import Status, Task
from app.models.user import User


class InMemoryRepository(Repository):
    """Dict-backed base for all in-memory repos."""

    def __init__(self):
        self._rows: dict = {}

    def _load(self, entity_id: str):
        return self._rows.get(entity_id)

    def _store(self, entity_id: str, entity) -> None:
        self._rows[entity_id] = entity

    def _delete(self, entity_id: str) -> bool:
        return self._rows.pop(entity_id, None) is not None

    def _scan(self):
        return iter(list(self._rows.values()))

    def clear(self) -> None:
        self._rows.clear()


class UserRepository(InMemoryRepository):
    entity_name = "user"

    def __init__(self):
        super().__init__()
        self._by_username: dict = {}

    def _store(self, entity_id: str, entity: User) -> None:
        super()._store(entity_id, entity)
        self._by_username[entity.username] = entity_id

    def _delete(self, entity_id: str) -> bool:
        user = self._load(entity_id)
        if user is not None:
            self._by_username.pop(user.username, None)
        return super()._delete(entity_id)

    def by_username(self, username: str):
        entity_id = self._by_username.get(username)
        return self._load(entity_id) if entity_id else None

    def active_users(self) -> list:
        return self.where(lambda u: u.active)


class TaskRepository(InMemoryRepository):
    entity_name = "task"

    def by_status(self, status: str) -> list:
        return self.where(lambda t: t.status == status)

    def by_assignee(self, username: str) -> list:
        return self.where(
            lambda t: t.assignee is not None
            and t.assignee.username == username)

    def open_count(self) -> int:
        return len(self.where(
            lambda t: t.status not in (Status.DONE, Status.CANCELLED)))

    def with_label(self, label: str) -> list:
        needle = label.lower()
        return self.where(lambda t: needle in t.labels)


class ProjectRepository(InMemoryRepository):
    entity_name = "project"

    def by_owner(self, username: str) -> list:
        return self.where(lambda p: p.owner.username == username)

    def active(self) -> list:
        return self.where(lambda p: not p.archived)

    def find_by_slug(self, slug: str):
        for project in self._scan():
            if project.slug == slug:
                return project
        return None


class Database:
    """Aggregate of every repository, the app's storage root."""

    def __init__(self):
        self.users = UserRepository()
        self.tasks = TaskRepository()
        self.projects = ProjectRepository()

    def reset(self) -> None:
        self.users.clear()
        self.tasks.clear()
        self.projects.clear()

    def stats(self) -> dict:
        return {
            "users": self.users.count(),
            "tasks": self.tasks.count(),
            "projects": self.projects.count(),
        }
