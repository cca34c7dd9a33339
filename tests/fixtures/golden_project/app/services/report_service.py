"""Reporting: aggregates over users, tasks, and projects.

A ReadOnlyService subclass exercising caching, comprehension-heavy
aggregation, and calls fanning out across the whole service layer.
"""

from app.core.registry import register_service
from app.db.memory import Database
from app.models.task import Priority, Status
from app.models.user import Role
from app.services.base import ReadOnlyService
from app.utils.dates import days_between, now_ts
from app.utils.formatting import humanize_duration, percent, table


@register_service("reports")
class ReportService(ReadOnlyService):
    service_name = "reports"

    def __init__(self, db: Database):
        super().__init__(db)

    def burndown(self, project_id: str) -> dict:
        project = self.db.projects.get(project_id)
        total = len(project.tasks)
        done = sum(1 for t in project.tasks.values()
                   if t.status == Status.DONE)
        open_tasks = list(project.open_tasks())
        oldest_days = max(
            (t.age_days() for t in open_tasks), default=0.0)
        return {
            "project": project.name,
            "total": total,
            "done": done,
            "remaining": total - done,
            "done_pct": percent(done / total if total else 0.0),
            "oldest_open_days": round(oldest_days, 1),
        }

    def velocity(self, window_days: float = 14.0) -> float:
        """Done tasks per day over the trailing window."""
        cutoff = now_ts() - window_days * 86400
        recent_done = [
            t for t in self.db.tasks.by_status(Status.DONE)
            if t.updated_at >= cutoff
        ]
        return len(recent_done) / window_days

    def load_by_role(self) -> dict:
        def compute():
            load: dict = {role: 0 for role in Role.ORDER}
            for task in self.db.tasks.all():
                if task.assignee is not None and task.status not in (
                        Status.DONE, Status.CANCELLED):
                    load[task.assignee.role] += 1
            return load

        return self.cached("load_by_role", compute)

    def priority_breakdown(self) -> dict:
        out = {label: 0 for label in Priority.LABELS.values()}
        for task in self.db.tasks.all():
            out[Priority.label(task.priority)] += 1
        return out

    def cycle_time_report(self) -> dict:
        """Mean age of finished tasks, humanized."""
        done = self.db.tasks.by_status(Status.DONE)
        if not done:
            return {"count": 0, "mean": "n/a"}
        mean_seconds = sum(
            (t.updated_at - t.created_at) for t in done) / len(done)
        return {
            "count": len(done),
            "mean": humanize_duration(mean_seconds),
        }

    def stale_tasks(self, older_than_days: float = 30.0) -> list:
        now = now_ts()
        return [
            t for t in self.db.tasks.all()
            if t.status not in (Status.DONE, Status.CANCELLED)
            and days_between(t.updated_at, now) > older_than_days
        ]

    def text_summary(self) -> str:
        rows = []
        for project in self.db.projects.active():
            burn = self.burndown(project.id)
            rows.append((project.name, burn["total"], burn["done_pct"]))
        header = table(rows, headers=["project", "tasks", "done"])
        breakdown = self.priority_breakdown()
        lines = [header, ""]
        lines.extend(
            f"  {label}: {count}" for label, count in breakdown.items())
        return "\n".join(lines)


def weekly_digest(db: Database) -> str:
    """Standalone digest used by the notification cron."""
    reports = ReportService(db)
    velocity = reports.velocity(7.0)
    stale = reports.stale_tasks(14.0)
    cycle = reports.cycle_time_report()
    return (
        f"velocity {velocity:.1f}/day; "
        f"{len(stale)} stale tasks; "
        f"cycle time {cycle['mean']} over {cycle['count']} tasks"
    )
