"""Webhook delivery: registry, retry queue, and the service facade.

Exercises: module-level registry mutation, classmethod constructors,
nested method-on-attribute calls (self.queue.drain), decorator-applied
event handlers, and cross-package calls into core/utils.
"""

import json

from app.core.config import get_config
from app.core.exceptions import ValidationError
from app.core.registry import handles, register_service
from app.services.base import BaseService
from app.utils.formatting import truncate
from app.utils.validators import non_empty


class Webhook:
    """A single registered endpoint with its event filter."""

    def __init__(self, url: str, events: list[str], secret: str = ""):
        self.url = non_empty(url, "url")
        self.events = set(events)
        self.secret = secret
        self.failures = 0
        self.disabled = False

    def matches(self, event: str) -> bool:
        if self.disabled:
            return False
        return "*" in self.events or event in self.events

    def record_failure(self, limit: int = 5) -> bool:
        """Returns True when the hook trips the failure breaker."""
        self.failures += 1
        if self.failures >= limit:
            self.disabled = True
        return self.disabled

    @classmethod
    def from_dict(cls, raw: dict) -> "Webhook":
        if "url" not in raw:
            raise ValidationError("webhook needs a url")
        return cls(raw["url"], raw.get("events", ["*"]),
                   raw.get("secret", ""))


class Delivery:
    """One pending POST: payload frozen at enqueue time."""

    def __init__(self, hook: Webhook, event: str, payload: dict):
        self.hook = hook
        self.event = event
        self.body = json.dumps(payload, sort_keys=True)
        self.attempts = 0

    def describe(self) -> str:
        return truncate(f"{self.event} -> {self.hook.url}", 120)


class DeliveryQueue:
    """FIFO with bounded retries; transport injected for tests."""

    def __init__(self, transport, max_attempts: int = 3):
        self.transport = transport
        self.max_attempts = max_attempts
        self.pending: list[Delivery] = []
        self.dead: list[Delivery] = []

    def enqueue(self, delivery: Delivery) -> None:
        self.pending.append(delivery)

    def drain(self) -> int:
        """Attempt every pending delivery once; returns success count."""
        delivered = 0
        still_pending: list[Delivery] = []
        for item in self.pending:
            item.attempts += 1
            if self.transport.post(item.hook.url, item.body):
                delivered += 1
            elif item.attempts >= self.max_attempts:
                item.hook.record_failure()
                self.dead.append(item)
            else:
                still_pending.append(item)
        self.pending = still_pending
        return delivered

    def depth(self) -> int:
        return len(self.pending)


class NullTransport:
    """Default transport: succeeds without IO (tests and dry runs)."""

    def post(self, url: str, body: str) -> bool:
        return bool(url and body)


@register_service("webhooks")
class WebhookService(BaseService):
    service_name = "webhooks"

    def __init__(self, db, transport=None):
        super().__init__(db)
        self.registry: dict[str, Webhook] = {}
        self.queue = DeliveryQueue(transport or NullTransport())

    def register_hook(self, name: str, raw: dict) -> Webhook:
        hook = Webhook.from_dict(raw)
        self.registry[name] = hook
        self._emit("registered", {"name": name, "url": hook.url})
        return hook

    def remove_hook(self, name: str) -> bool:
        if name in self.registry:
            del self.registry[name]
            self._emit("removed", {"name": name})
            return True
        return False

    def fire(self, event: str, payload: dict) -> int:
        """Enqueue one delivery per matching hook, then drain once."""
        config = get_config().notifications
        if not config.enabled:
            return 0
        queued = 0
        for hook in self.registry.values():
            if hook.matches(event):
                self.queue.enqueue(Delivery(hook, event, payload))
                queued += 1
        if queued:
            self._emit("fired", {"event": event, "hooks": queued})
        return self.queue.drain()

    def failing_hooks(self) -> list[str]:
        return sorted(name for name, hook in self.registry.items()
                      if hook.disabled)


_default_service: "WebhookService | None" = None


def activate(service: "WebhookService") -> None:
    """Binds the module-level event handler to one live service."""
    global _default_service
    _default_service = service


@handles("tasks.completed")
def _on_task_completed(payload: dict) -> int:
    if _default_service is None:
        return 0
    return _default_service.fire("tasks.completed", payload)


def summarize_queue(service: WebhookService) -> str:
    """Human-readable one-liner used by the CLI status path."""
    depth = service.queue.depth()
    dead = len(service.queue.dead)
    return truncate(f"webhooks: {depth} pending, {dead} dead", 60)
