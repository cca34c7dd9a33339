"""Outbound integrations: webhooks and the Slack bridge built on them."""
