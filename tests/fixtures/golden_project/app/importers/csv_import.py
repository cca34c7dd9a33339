"""CSV import: bulk-load tasks and users from delimited text.

Exercises parsing loops, error accumulation, and service composition
from a leaf module.
"""

from app.core.exceptions import ValidationError
from app.db.memory import Database
from app.models.task import Priority
from app.services.task_service import TaskService
from app.services.user_service import UserService

PRIORITY_BY_NAME = {
    "low": Priority.LOW,
    "normal": Priority.NORMAL,
    "high": Priority.HIGH,
    "urgent": Priority.URGENT,
}


class ImportReport:
    def __init__(self):
        self.created = 0
        self.skipped = 0
        self.errors: list = []

    def ok(self) -> bool:
        return not self.errors

    def record_error(self, line_no: int, message: str) -> None:
        self.errors.append(f"line {line_no}: {message}")

    def summary(self) -> str:
        return (f"{self.created} created, {self.skipped} skipped, "
                f"{len(self.errors)} errors")


def split_csv_line(line: str, delimiter: str = ",") -> list:
    """Split honoring double-quoted fields (no external csv dependency)."""
    fields = []
    current = []
    in_quotes = False
    for ch in line:
        if ch == '"':
            in_quotes = not in_quotes
        elif ch == delimiter and not in_quotes:
            fields.append("".join(current).strip())
            current = []
        else:
            current.append(ch)
    fields.append("".join(current).strip())
    return fields


class TaskImporter:
    """Imports `title,priority,assignee,labels` rows."""

    expected_columns = 4

    def __init__(self, db: Database, actor):
        self.db = db
        self.actor = actor
        self.tasks = TaskService(db)
        self.users = UserService(db)

    def parse_priority(self, text: str) -> int:
        name = (text or "normal").strip().lower()
        if name not in PRIORITY_BY_NAME:
            raise ValidationError(f"unknown priority {name!r}",
                                  field_name="priority")
        return PRIORITY_BY_NAME[name]

    def import_row(self, fields: list):
        title, priority_text, assignee_name, labels = (
            fields + [""] * self.expected_columns)[:self.expected_columns]
        task = self.tasks.create_task(
            self.actor, title, priority=self.parse_priority(priority_text))
        if assignee_name:
            assignee = self.db.users.by_username(assignee_name)
            if assignee is not None:
                self.tasks.assign(self.actor, task.id, assignee)
        for label in labels.split(";"):
            if label.strip():
                task.add_label(label.strip())
        return task

    def run(self, text: str) -> ImportReport:
        report = ImportReport()
        for line_no, line in enumerate(text.splitlines(), start=1):
            stripped = line.strip()
            if not stripped or stripped.startswith("#"):
                report.skipped += 1
                continue
            fields = split_csv_line(stripped)
            try:
                self.import_row(fields)
                report.created += 1
            except ValidationError as exc:
                report.record_error(line_no, exc.message)
        return report


class UserImporter:
    """Imports `username,email,display name,role` rows."""

    def __init__(self, db: Database):
        self.db = db
        self.users = UserService(db)

    def run(self, text: str) -> ImportReport:
        report = ImportReport()
        for line_no, line in enumerate(text.splitlines(), start=1):
            stripped = line.strip()
            if not stripped or stripped.startswith("#"):
                report.skipped += 1
                continue
            fields = split_csv_line(stripped)
            username, email, display, role = (fields + [""] * 4)[:4]
            try:
                self.users.register_user(
                    username, email, display, role or "member")
                report.created += 1
            except ValidationError as exc:
                report.record_error(line_no, exc.message)
            except Exception as exc:  # conflicts etc.
                report.record_error(line_no, str(exc))
        return report
