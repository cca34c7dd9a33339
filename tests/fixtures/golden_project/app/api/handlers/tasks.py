"""Task HTTP handlers: thin adapters over TaskService."""

from app.api.router import Request, Response, route
from app.db.memory import Database
from app.models.task import Priority
from app.services.task_service import TaskService
from app.utils.validators import validate_page

_db = Database()
_service = TaskService(_db)


def use_database(db: Database) -> TaskService:
    """Swap the module-level singletons (tests call this)."""
    global _db, _service
    _db = db
    _service = TaskService(db)
    return _service


@route("POST", "/tasks")
def create_task(request: Request) -> Response:
    task = _service.create_task(
        request.actor,
        title=request.param("title", ""),
        description=request.param("description", ""),
        priority=int(request.param("priority", Priority.NORMAL)),
    )
    return Response.created(task.to_dict())


@route("GET", "/tasks")
def list_tasks(request: Request) -> Response:
    page, size = validate_page(
        int(request.param("page", 1)), int(request.param("size", 25)))
    tasks = _service.db.tasks.all()
    start = (page - 1) * size
    window = tasks[start:start + size]
    return Response.ok({
        "total": len(tasks),
        "items": [t.to_dict() for t in window],
    })


@route("POST", "/tasks/transition")
def transition_task(request: Request) -> Response:
    task = _service.transition(
        request.actor, request.param("id"), request.param("to"))
    return Response.ok(task.to_dict())


@route("POST", "/tasks/assign")
def assign_task(request: Request) -> Response:
    assignee = _service.db.users.by_username(request.param("assignee"))
    if assignee is None:
        return Response.error(404, "assignee not found")
    task = _service.assign(request.actor, request.param("id"), assignee)
    return Response.ok(task.to_dict())


@route("POST", "/tasks/comment")
def comment_on_task(request: Request) -> Response:
    task = _service.comment(
        request.actor, request.param("id"), request.param("body", ""))
    return Response.ok({"comments": len(task.comments)})


@route("GET", "/tasks/inbox")
def my_inbox(request: Request) -> Response:
    tasks = _service.inbox(request.actor)
    return Response.ok([t.to_dict() for t in tasks])


@route("GET", "/tasks/stats")
def task_stats(request: Request) -> Response:
    return Response.ok(_service.stats_by_status())
