"""Service registry with decorator-based registration.

Exercises decorators (plain and parameterized), class decorators, and
dict-based dispatch — constructs the extractor must attribute correctly.
"""

from functools import wraps

from app.core.exceptions import NotFoundError

_services: dict = {}
_handlers: dict = {}


def register_service(name: str):
    """Parameterized class decorator: register a service under a name."""

    def decorator(cls):
        _services[name] = cls
        cls.service_name = name
        return cls

    return decorator


def get_service(name: str):
    if name not in _services:
        raise NotFoundError("service", name)
    return _services[name]


def list_services() -> list:
    return sorted(_services.keys())


def handles(event: str):
    """Parameterized function decorator: register an event handler."""

    def decorator(fn):
        @wraps(fn)
        def wrapper(*args, **kwargs):
            return fn(*args, **kwargs)

        _handlers.setdefault(event, []).append(wrapper)
        return wrapper

    return decorator


def emit(event: str, payload: dict) -> int:
    """Invoke every handler registered for the event."""
    count = 0
    for handler in _handlers.get(event, []):
        handler(payload)
        count += 1
    return count


def timed(fn):
    """Plain decorator: measure call duration (attached as attribute)."""
    import time

    @wraps(fn)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            wrapper.last_ms = (time.perf_counter() - start) * 1000.0

    wrapper.last_ms = 0.0
    return wrapper


class ServiceLocator:
    """Instance-holding facade over the registry."""

    def __init__(self):
        self._instances: dict = {}

    def resolve(self, name: str):
        if name not in self._instances:
            cls = get_service(name)
            self._instances[name] = cls()
        return self._instances[name]

    def reset(self) -> None:
        self._instances.clear()
