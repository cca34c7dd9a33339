"""Project and milestone models: aggregation over tasks.

Exercises composition, generator methods, and dict/str formatting calls
into the utils package.
"""

from app.core.exceptions import QuotaExceededError, ValidationError
from app.models.base import NamedEntity
from app.models.task import Status, Task
from app.models.user import Team, User
from app.utils.formatting import percent, truncate


class Milestone(NamedEntity):
    id_prefix = "mls"

    def __init__(self, name: str, due_ts: float):
        super().__init__(name)
        self.due_ts = due_ts
        self.task_ids: list = []

    def attach(self, task: Task) -> None:
        if task.id not in self.task_ids:
            self.task_ids.append(task.id)

    def detach(self, task: Task) -> None:
        if task.id in self.task_ids:
            self.task_ids.remove(task.id)


class Project(NamedEntity):
    id_prefix = "prj"
    max_tasks = 5000

    def __init__(self, name: str, owner: User, description: str = ""):
        super().__init__(name, description)
        self.owner = owner
        self.team: Team = Team(f"{name} team", owner)
        self.tasks: dict = {}
        self.milestones: list = []
        self.archived = False

    def validate(self) -> None:
        super().validate()
        if self.owner is None:
            raise ValidationError("project needs an owner",
                                  field_name="owner")

    def add_task(self, task: Task) -> Task:
        if len(self.tasks) >= self.max_tasks:
            raise QuotaExceededError("tasks", self.max_tasks)
        self.tasks[task.id] = task
        self.touch()
        return task

    def remove_task(self, task_id: str) -> bool:
        if task_id in self.tasks:
            del self.tasks[task_id]
            for milestone in self.milestones:
                milestone.task_ids = [
                    t for t in milestone.task_ids if t != task_id]
            return True
        return False

    def add_milestone(self, milestone: Milestone) -> None:
        self.milestones.append(milestone)

    def open_tasks(self):
        """Generator over tasks not yet finished."""
        for task in self.tasks.values():
            if task.status not in (Status.DONE, Status.CANCELLED):
                yield task

    def completion_ratio(self) -> float:
        if not self.tasks:
            return 0.0
        done = sum(1 for t in self.tasks.values()
                   if t.status == Status.DONE)
        return done / len(self.tasks)

    def summary_line(self) -> str:
        ratio = self.completion_ratio()
        return (f"{truncate(self.name, 32)}: "
                f"{percent(ratio)} of {len(self.tasks)} tasks done")

    def workload_by_user(self) -> dict:
        load: dict = {}
        for task in self.open_tasks():
            if task.assignee is not None:
                load[task.assignee.username] = \
                    load.get(task.assignee.username, 0) + 1
        return load

    def archive(self, actor: User) -> None:
        actor.require("close_project")
        self.archived = True
        self.touch()


class Portfolio:
    """A collection of projects with aggregate reporting."""

    def __init__(self, name: str):
        self.name = name
        self.projects: list = []

    def add(self, project: Project) -> None:
        self.projects.append(project)

    def active_projects(self) -> list:
        return [p for p in self.projects if not p.archived]

    def total_open_tasks(self) -> int:
        return sum(len(list(p.open_tasks()))
                   for p in self.active_projects())

    def report(self) -> list:
        return [p.summary_line() for p in self.active_projects()]
