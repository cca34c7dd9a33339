"""Task lifecycle use-cases: creation, transitions, assignment, queries."""

from app.core.exceptions import NotFoundError, ValidationError
from app.core.registry import register_service, timed
from app.models.task import (
    Priority,
    RecurringTask,
    Status,
    Subtask,
    Task,
    by_priority,
    filter_overdue,
)
from app.models.user import User
from app.services.base import BaseService
from app.utils.dates import add_days, now_ts
from app.utils.validators import non_empty, validate_priority


@register_service("tasks")
class TaskService(BaseService):
    service_name = "tasks"

    def create_task(self, actor: User, title: str, description: str = "",
                    priority: int = Priority.NORMAL,
                    due_in_days: float | None = None) -> Task:
        self._require_actor(actor, "create_task")
        non_empty(title, "title")
        validate_priority(priority)
        task = Task(title, description, priority)
        if due_in_days is not None:
            task.due_ts = add_days(now_ts(), due_in_days)
        task.validate()
        self.db.tasks.save(task)
        self._emit("created", {"id": task.id, "by": actor.username})
        return task

    def create_subtask(self, actor: User, parent_id: str,
                       title: str) -> Subtask:
        parent = self.db.tasks.get(parent_id)
        subtask = Subtask(title, parent)
        subtask.validate()
        self.db.tasks.save(subtask)
        self._emit("created", {"id": subtask.id, "parent": parent.id})
        return subtask

    def create_recurring(self, actor: User, title: str,
                         every_days: int) -> RecurringTask:
        self._require_actor(actor, "create_task")
        if every_days < 1:
            raise ValidationError("recurrence must be >= 1 day",
                                  field_name="every_days")
        task = RecurringTask(title, every_days)
        self.db.tasks.save(task)
        return task

    @timed
    def transition(self, actor: User, task_id: str, target: str) -> Task:
        task = self.db.tasks.get(task_id)
        task.transition(target)
        self.db.tasks.save(task)
        self._emit("transitioned",
                   {"id": task.id, "to": target, "by": actor.username})
        return task

    def assign(self, actor: User, task_id: str, assignee: User) -> Task:
        self._require_actor(actor, "assign")
        task = self.db.tasks.get(task_id)
        task.assign(assignee)
        self.db.tasks.save(task)
        self._emit("assigned", {"id": task.id, "to": assignee.username})
        return task

    def comment(self, actor: User, task_id: str, body: str) -> Task:
        task = self.db.tasks.get(task_id)
        task.add_comment(actor, non_empty(body, "body"))
        self.db.tasks.save(task)
        return task

    def start(self, actor: User, task_id: str) -> Task:
        """Convenience: backlog/todo -> in_progress in one call."""
        task = self.db.tasks.get(task_id)
        if task.status == Status.BACKLOG:
            task.transition(Status.TODO)
        task.transition(Status.IN_PROGRESS)
        self.db.tasks.save(task)
        return task

    def finish(self, actor: User, task_id: str) -> Task:
        task = self.db.tasks.get(task_id)
        if task.status == Status.IN_PROGRESS:
            task.transition(Status.REVIEW)
        task.transition(Status.DONE)
        self.db.tasks.save(task)
        self._emit("finished", {"id": task.id, "by": actor.username})
        return task

    # -- queries --

    def inbox(self, user: User) -> list:
        """Open tasks assigned to the user, urgent first."""
        mine = self.db.tasks.by_assignee(user.username)
        open_tasks = [t for t in mine
                      if t.status not in (Status.DONE, Status.CANCELLED)]
        return sorted(open_tasks, key=lambda t: -t.priority)

    def overdue_report(self) -> list:
        return filter_overdue(self.db.tasks.all())

    def hot_list(self, minimum: int = Priority.HIGH) -> list:
        return by_priority(self.db.tasks.all(), minimum)

    def find_or_fail(self, task_id: str) -> Task:
        task = self.db.tasks.find(task_id)
        if task is None:
            raise NotFoundError("task", task_id)
        return task

    def stats_by_status(self) -> dict:
        counts: dict = {}
        for task in self.db.tasks.all():
            counts[task.status] = counts.get(task.status, 0) + 1
        return counts
