"""Scheduled digest jobs wiring scheduler + reports + notifications."""

from app.db.memory import Database
from app.models.user import Role
from app.scheduling.scheduler import Scheduler
from app.services.notification_service import NotificationService
from app.services.report_service import ReportService, weekly_digest
from app.services.user_service import UserService


class DigestRunner:
    """Builds and sends periodic digests to the right audiences."""

    def __init__(self, db: Database):
        self.db = db
        self.reports = ReportService(db)
        self.notifications = NotificationService(db)
        self.users = UserService(db)
        self.sent = 0

    def managers(self) -> list:
        return [u for u in self.db.users.active_users()
                if Role.at_least(u.role, Role.MANAGER)]

    def send_weekly(self) -> int:
        body = weekly_digest(self.db)
        count = 0
        for manager in self.managers():
            if self.notifications.notify_user(manager, body) is not None:
                count += 1
        self.sent += count
        return count

    def send_stale_warnings(self, older_than_days: float = 14.0) -> int:
        stale = self.reports.stale_tasks(older_than_days)
        count = 0
        for task in stale:
            if task.assignee is None:
                continue
            note = self.notifications.notify_user(
                task.assignee,
                f"task '{task.name}' has been idle {older_than_days:.0f}+ "
                f"days")
            if note is not None:
                count += 1
        self.sent += count
        return count


def install_digest_jobs(db: Database, scheduler: Scheduler) -> DigestRunner:
    """Register the standard digest cadence on a scheduler."""
    runner = DigestRunner(db)
    scheduler.register("weekly-digest", "daily@8", runner.send_weekly,
                       priority=2)
    scheduler.register("stale-warnings", "every:6h",
                       runner.send_stale_warnings, priority=1)
    return runner
