"""Slack bridge: a WebhookService specialization with channel routing.

Exercises: three-level inheritance (BaseService -> WebhookService ->
SlackIntegration), super() delegation through the middle of the chain,
dict-comprehension state, and calls into the sibling webhooks module.
"""

from app.core.config import get_config
from app.integrations.webhooks import Delivery, Webhook, WebhookService
from app.models.user import Team
from app.utils.formatting import truncate


class SlackMessage:
    """Block-kit-lite: header + lines, rendered to one text blob."""

    def __init__(self, header: str):
        self.header = header
        self.lines: list[str] = []

    def add_line(self, text: str) -> "SlackMessage":
        self.lines.append(truncate(text, 150))
        return self

    def render(self) -> str:
        body = "\n".join(self.lines)
        return f"*{self.header}*\n{body}" if body else f"*{self.header}*"


class ChannelMap:
    """Event-prefix -> channel routing with a default fallback."""

    def __init__(self, default: str = "#general"):
        self.default = default
        self.routes: dict[str, str] = {}

    def route(self, prefix: str, channel: str) -> None:
        self.routes[prefix] = channel

    def resolve(self, event: str) -> str:
        for prefix, channel in sorted(self.routes.items(),
                                      key=lambda kv: -len(kv[0])):
            if event.startswith(prefix):
                return channel
        return self.default


class SlackIntegration(WebhookService):
    """Webhook service whose deliveries carry rendered Slack payloads."""

    service_name = "slack"

    def __init__(self, db, workspace_url: str, transport=None):
        super().__init__(db, transport=transport)
        self.channels = ChannelMap()
        self.workspace = workspace_url
        self.sent_by_channel: dict[str, int] = {}

    def connect_channel(self, prefix: str, channel: str) -> Webhook:
        """One webhook per channel; the route decides which fires."""
        self.channels.route(prefix, channel)
        return self.register_hook(
            channel, {"url": f"{self.workspace}/hooks{channel}",
                      "events": [f"{prefix}*", prefix.rstrip(".")]})

    def post_message(self, event: str, message: SlackMessage) -> int:
        channel = self.channels.resolve(event)
        delivered = self.fire(event, {"channel": channel,
                                      "text": message.render()})
        if delivered:
            self.sent_by_channel[channel] = (
                self.sent_by_channel.get(channel, 0) + delivered)
        return delivered

    def announce_to_team(self, team: Team, subject: str) -> int:
        config = get_config().notifications
        if not config.enabled:
            return 0
        msg = SlackMessage(subject)
        for member in team.members:
            msg.add_line(f"cc {member.email}")
        return self.post_message("team.announcement", msg)

    def busiest_channels(self, top: int = 3) -> list[tuple[str, int]]:
        ranked = sorted(self.sent_by_channel.items(),
                        key=lambda kv: (-kv[1], kv[0]))
        return ranked[:top]


def preview_delivery(delivery: Delivery) -> str:
    """Debug helper the CLI uses when --verbose printing the queue."""
    return truncate(delivery.describe(), 80)
