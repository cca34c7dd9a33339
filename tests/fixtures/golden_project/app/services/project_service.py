"""Project orchestration: combines task, user, and notification services."""

from app.core.registry import register_service
from app.db.memory import Database
from app.models.project import Milestone, Portfolio, Project
from app.models.task import Status
from app.models.user import User
from app.services.base import BaseService
from app.services.notification_service import NotificationService
from app.services.task_service import TaskService
from app.utils.dates import add_days, now_ts
from app.utils.formatting import pluralize


@register_service("projects")
class ProjectService(BaseService):
    service_name = "projects"

    def __init__(self, db: Database):
        super().__init__(db)
        self.tasks = TaskService(db)
        self.notifications = NotificationService(db)

    def create_project(self, owner: User, name: str,
                       description: str = "") -> Project:
        self._require_actor(owner, "create_task")
        project = Project(name, owner, description)
        project.validate()
        self.db.projects.save(project)
        self._emit("created", {"id": project.id, "owner": owner.username})
        return project

    def plan_milestone(self, actor: User, project_id: str, name: str,
                       due_in_days: float) -> Milestone:
        project = self.db.projects.get(project_id)
        milestone = Milestone(name, add_days(now_ts(), due_in_days))
        project.add_milestone(milestone)
        self.db.projects.save(project)
        return milestone

    def add_task_to_project(self, actor: User, project_id: str,
                            title: str, priority: int = 1):
        project = self.db.projects.get(project_id)
        task = self.tasks.create_task(actor, title, priority=priority)
        project.add_task(task)
        self.db.projects.save(project)
        return task

    def staff(self, actor: User, project_id: str, member: User) -> None:
        self._require_actor(actor, "assign")
        project = self.db.projects.get(project_id)
        project.team.add_member(member)
        self.db.projects.save(project)
        self.notifications.notify_user(
            member, f"you joined {project.name}")

    def close_finished(self, actor: User, project_id: str) -> int:
        """Cancel every remaining open task and archive the project."""
        project = self.db.projects.get(project_id)
        cancelled = 0
        for task in list(project.open_tasks()):
            if Status.can_transition(task.status, Status.CANCELLED):
                task.transition(Status.CANCELLED)
                cancelled += 1
        project.archive(actor)
        self.db.projects.save(project)
        self.notifications.notify_team(
            project.team,
            f"{project.name} archived; "
            f"{pluralize(cancelled, 'task')} cancelled")
        return cancelled

    def standup_report(self, project_id: str) -> dict:
        project = self.db.projects.get(project_id)
        workload = project.workload_by_user()
        return {
            "project": project.name,
            "summary": project.summary_line(),
            "workload": workload,
            "overdue": [t.name for t in project.open_tasks()
                        if t.is_overdue()],
        }

    def portfolio(self, name: str = "all") -> Portfolio:
        folio = Portfolio(name)
        for project in self.db.projects.active():
            folio.add(project)
        return folio
