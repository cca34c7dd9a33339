"""Demo command-line surface tying the services together."""

import sys

from app.api.middleware import build_chain
from app.api.router import Request
from app.db.memory import Database
from app.models.task import Priority
from app.services.project_service import ProjectService
from app.services.task_service import TaskService
from app.services.user_service import UserService, bootstrap_admin
from app.utils.formatting import table


def seed_demo(db: Database) -> dict:
    """Populate a small believable workspace."""
    admin = bootstrap_admin(db)
    users = UserService(db)
    projects = ProjectService(db)
    tasks = TaskService(db)

    alice = users.register_user("alice", "alice@example.com", "Alice Chen",
                                role="manager")
    bob = users.register_user("bob", "bob@example.com", "Bob Ruiz")

    launch = projects.create_project(alice, "Launch",
                                     "Ship the first release")
    t1 = projects.add_task_to_project(alice, launch.id, "Write docs",
                                      priority=Priority.HIGH)
    t2 = projects.add_task_to_project(alice, launch.id, "Fix login bug",
                                      priority=Priority.URGENT)
    projects.staff(alice, launch.id, bob)
    tasks.assign(alice, t1.id, bob)
    tasks.assign(alice, t2.id, alice)
    tasks.start(bob, t1.id)
    return {"admin": admin, "alice": alice, "bob": bob,
            "project": launch, "tasks": [t1, t2]}


def cmd_report(db: Database) -> str:
    projects = ProjectService(db)
    folio = projects.portfolio()
    rows = [(p.name, len(p.tasks), f"{p.completion_ratio():.0%}")
            for p in folio.active_projects()]
    return table(rows, headers=["project", "tasks", "done"])


def cmd_inbox(db: Database, username: str) -> str:
    users = UserService(db)
    tasks = TaskService(db)
    user = users.find_by_username(username)
    rows = [(t.id, t.name, t.status, Priority.label(t.priority))
            for t in tasks.inbox(user)]
    return table(rows, headers=["id", "title", "status", "priority"])


def cmd_api(db: Database, path: str, username: str) -> str:
    users = UserService(db)
    actor = users.find_by_username(username)
    chain = build_chain()
    response = chain.handle(Request("GET", path, actor=actor))
    return f"{response.status}: {response.data}"


def main(argv: list | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    db = Database()
    seeded = seed_demo(db)
    command = argv[0] if argv else "report"
    if command == "report":
        print(cmd_report(db))
    elif command == "inbox":
        print(cmd_inbox(db, argv[1] if len(argv) > 1 else "bob"))
    elif command == "api":
        print(cmd_api(db, argv[1] if len(argv) > 1 else "/tasks/stats",
                      seeded["alice"].username))
    else:
        print(f"unknown command: {command}")
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
