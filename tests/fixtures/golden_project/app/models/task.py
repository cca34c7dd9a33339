"""Task domain models: tasks, subtasks, comments, status machine.

Exercises state transitions, nested class usage, list comprehensions over
typed collections, and method chains across modules.
"""

from app.core.exceptions import ConflictError, ValidationError
from app.models.base import NamedEntity
from app.models.user import User
from app.utils.dates import days_between, now_ts


class Status:
    BACKLOG = "backlog"
    TODO = "todo"
    IN_PROGRESS = "in_progress"
    REVIEW = "review"
    DONE = "done"
    CANCELLED = "cancelled"

    TRANSITIONS = {
        BACKLOG: (TODO, CANCELLED),
        TODO: (IN_PROGRESS, CANCELLED),
        IN_PROGRESS: (REVIEW, TODO, CANCELLED),
        REVIEW: (DONE, IN_PROGRESS),
        DONE: (),
        CANCELLED: (TODO,),
    }

    @classmethod
    def can_transition(cls, current: str, target: str) -> bool:
        return target in cls.TRANSITIONS.get(current, ())


class Priority:
    LOW = 0
    NORMAL = 1
    HIGH = 2
    URGENT = 3

    LABELS = {LOW: "low", NORMAL: "normal", HIGH: "high", URGENT: "urgent"}

    @classmethod
    def label(cls, value: int) -> str:
        return cls.LABELS.get(value, "unknown")


class Comment:
    def __init__(self, author: User, body: str):
        self.author = author
        self.body = body
        self.at = now_ts()
        self.edited = False

    def edit(self, body: str) -> None:
        self.body = body
        self.edited = True


class Task(NamedEntity):
    id_prefix = "tsk"

    def __init__(self, title: str, description: str = "",
                 priority: int = Priority.NORMAL):
        super().__init__(title, description)
        self.status = Status.BACKLOG
        self.priority = priority
        self.assignee: User | None = None
        self.comments: list = []
        self.labels: set = set()
        self.due_ts: float | None = None
        self.estimate_hours: float = 0.0

    def validate(self) -> None:
        super().validate()
        if self.priority not in Priority.LABELS:
            raise ValidationError("bad priority", field_name="priority")
        if self.estimate_hours < 0:
            raise ValidationError("negative estimate",
                                  field_name="estimate_hours")

    def transition(self, target: str) -> None:
        if not Status.can_transition(self.status, target):
            raise ConflictError(
                f"cannot move {self.id} from {self.status} to {target}")
        self.status = target
        self.touch()

    def assign(self, user: User) -> None:
        user.require("create_task")
        self.assignee = user
        self.touch()

    def add_comment(self, author: User, body: str) -> Comment:
        comment = Comment(author, body)
        self.comments.append(comment)
        self.touch()
        return comment

    def add_label(self, label: str) -> None:
        self.labels.add(label.lower())

    def is_overdue(self) -> bool:
        return self.due_ts is not None and self.due_ts < now_ts() \
            and self.status not in (Status.DONE, Status.CANCELLED)

    def age_days(self) -> float:
        return days_between(self.created_at, now_ts())

    def to_dict(self) -> dict:
        data = super().to_dict()
        data.update({
            "status": self.status,
            "priority": Priority.label(self.priority),
            "assignee": self.assignee.id if self.assignee else None,
            "labels": sorted(self.labels),
            "comments": len(self.comments),
        })
        return data


class Subtask(Task):
    """A task nested under a parent; completion rolls up."""

    id_prefix = "sub"

    def __init__(self, title: str, parent: Task):
        super().__init__(title)
        self.parent = parent

    def transition(self, target: str) -> None:
        super().transition(target)
        if target == Status.DONE and isinstance(self.parent, Task):
            self.parent.touch()


class RecurringTask(Task):
    """Respawns itself when done."""

    def __init__(self, title: str, every_days: int):
        super().__init__(title)
        self.every_days = every_days
        self.occurrences = 0

    def transition(self, target: str) -> None:
        super().transition(target)
        if target == Status.DONE:
            self.occurrences += 1
            self.status = Status.TODO
            self.due_ts = now_ts() + self.every_days * 86400


def filter_overdue(tasks: list) -> list:
    return [t for t in tasks if t.is_overdue()]


def by_priority(tasks: list, minimum: int = Priority.HIGH) -> list:
    return sorted(
        (t for t in tasks if t.priority >= minimum),
        key=lambda t: -t.priority)
