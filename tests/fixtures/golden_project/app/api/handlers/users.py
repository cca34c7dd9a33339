"""User HTTP handlers: registration, profile, role management."""

from app.api.router import Request, Response, route
from app.db.memory import Database
from app.services.user_service import UserService
from app.utils.formatting import initials

_db = Database()
_service = UserService(_db)


def use_database(db: Database) -> UserService:
    global _db, _service
    _db = db
    _service = UserService(db)
    return _service


@route("POST", "/users")
def register(request: Request) -> Response:
    user = _service.register_user(
        username=request.param("username", ""),
        email=request.param("email", ""),
        display_name=request.param("display_name", ""),
        role=request.param("role", "member"),
    )
    return Response.created(user.to_dict())


@route("GET", "/users/me")
def profile(request: Request) -> Response:
    user = request.actor
    data = user.to_dict()
    data["initials"] = initials(user.name)
    return Response.ok(data)


@route("POST", "/users/role")
def change_role(request: Request) -> Response:
    user = _service.change_role(
        request.actor, request.param("id"), request.param("role"))
    return Response.ok(user.to_dict())


@route("POST", "/users/deactivate")
def deactivate(request: Request) -> Response:
    _service.deactivate(request.actor, request.param("id"))
    return Response.ok({"ok": True})


@route("GET", "/users/search")
def search_users(request: Request) -> Response:
    hits = _service.search(request.param("q", ""),
                           limit=int(request.param("limit", 20)))
    return Response.ok([u.to_dict() for u in hits])
