"""Notification fan-out: in-process queue with channel routing."""

from app.core.config import get_config
from app.core.registry import handles, register_service
from app.models.user import Team, User
from app.services.base import BaseService
from app.utils.formatting import truncate


class Notification:
    def __init__(self, recipient: str, message: str, channel: str = "email"):
        self.recipient = recipient
        self.message = message
        self.channel = channel
        self.delivered = False


@register_service("notifications")
class NotificationService(BaseService):
    service_name = "notifications"

    def __init__(self, db):
        super().__init__(db)
        self.queue: list = []
        self.delivered_count = 0

    def notify_user(self, user: User, message: str) -> Notification | None:
        config = get_config().notifications
        if not config.enabled or not user.active:
            return None
        note = Notification(user.email, truncate(message, 200))
        self.queue.append(note)
        self._emit("queued", {"to": user.email})
        return note

    def notify_team(self, team: Team, message: str) -> int:
        sent = 0
        for member in team.members:
            if self.notify_user(member, message) is not None:
                sent += 1
        return sent

    def flush(self) -> int:
        """Deliver everything queued; returns the number delivered."""
        delivered = 0
        for note in self.queue:
            if not note.delivered:
                note.delivered = True
                delivered += 1
        self.delivered_count += delivered
        self.queue = [n for n in self.queue if not n.delivered]
        return delivered

    def pending(self) -> int:
        return len(self.queue)


@handles("tasks.finished")
def congratulate(payload: dict) -> str:
    """Event handler wired through the registry decorator."""
    return f"nice work on {payload.get('id', '?')}"


@handles("projects.created")
def track_project_creation(payload: dict) -> str:
    return f"project {payload.get('id', '?')} created"
