"""Minimal HTTP-shaped router: decorator-registered handlers.

No real networking — request/response are plain dicts, which keeps the
fixture offline while exercising the decorator + dispatch shapes of a
web framework.
"""

from app.core.exceptions import NotFoundError, TaskforgeError

_routes: dict = {}


class Request:
    def __init__(self, method: str, path: str, body: dict | None = None,
                 query: dict | None = None, actor=None):
        self.method = method.upper()
        self.path = path
        self.body = body or {}
        self.query = query or {}
        self.actor = actor

    def param(self, name: str, default=None):
        return self.body.get(name, self.query.get(name, default))


class Response:
    def __init__(self, status: int, data):
        self.status = status
        self.data = data

    @classmethod
    def ok(cls, data) -> "Response":
        return cls(200, data)

    @classmethod
    def created(cls, data) -> "Response":
        return cls(201, data)

    @classmethod
    def error(cls, status: int, message: str) -> "Response":
        return cls(status, {"error": message})


def route(method: str, path: str):
    """Register a handler for METHOD path."""

    def decorator(fn):
        _routes[(method.upper(), path)] = fn
        return fn

    return decorator


def dispatch(request: Request) -> Response:
    handler = _routes.get((request.method, request.path))
    if handler is None:
        return Response.error(404, f"no route {request.method} {request.path}")
    try:
        return handler(request)
    except NotFoundError as exc:
        return Response.error(404, exc.message)
    except TaskforgeError as exc:
        return Response.error(400, exc.message)


def registered_routes() -> list:
    return sorted(f"{m} {p}" for (m, p) in _routes)
