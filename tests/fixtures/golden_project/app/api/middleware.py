"""Request middleware chain: auth, rate limit, logging."""

import time

from app.api.router import Request, Response, dispatch
from app.core.config import get_config
from app.models.user import User


class Middleware:
    """Base middleware: pass-through."""

    def __init__(self, nxt=None):
        self.next = nxt

    def handle(self, request: Request) -> Response:
        if self.next is not None:
            return self.next.handle(request)
        return dispatch(request)


class AuthMiddleware(Middleware):
    """Reject requests with no actor; resolve tokens to users."""

    def __init__(self, nxt=None, token_map: dict | None = None):
        super().__init__(nxt)
        self.tokens = token_map or {}

    def handle(self, request: Request) -> Response:
        if request.actor is None:
            token = request.query.get("token")
            user = self.tokens.get(token)
            if user is None:
                return Response.error(401, "authentication required")
            request.actor = user
        if isinstance(request.actor, User) and not request.actor.active:
            return Response.error(403, "account deactivated")
        return super().handle(request)


class RateLimitMiddleware(Middleware):
    def __init__(self, nxt=None, max_per_minute: int = 120):
        super().__init__(nxt)
        self.max_per_minute = max_per_minute
        self._windows: dict = {}

    def handle(self, request: Request) -> Response:
        key = getattr(request.actor, "id", "anonymous")
        window = int(time.time() // 60)
        bucket = self._windows.setdefault((key, window), [0])
        bucket[0] += 1
        if bucket[0] > self.max_per_minute:
            return Response.error(429, "rate limit exceeded")
        return super().handle(request)


class LoggingMiddleware(Middleware):
    def __init__(self, nxt=None):
        super().__init__(nxt)
        self.log: list = []

    def handle(self, request: Request) -> Response:
        start = time.perf_counter()
        response = super().handle(request)
        self.log.append({
            "path": request.path,
            "method": request.method,
            "status": response.status,
            "ms": (time.perf_counter() - start) * 1000.0,
        })
        return response


def build_chain(token_map: dict | None = None) -> Middleware:
    """Assemble the standard middleware stack (outermost first)."""
    config = get_config()
    chain = Middleware()
    chain = RateLimitMiddleware(chain,
                                max_per_minute=240 if config.debug else 120)
    chain = AuthMiddleware(chain, token_map)
    return LoggingMiddleware(chain)
