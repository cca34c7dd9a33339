"""Validation helpers."""
import re

EMAIL_RE = re.compile(r"^[^@\s]+@[^@\s]+\.[^@\s]+$")


def validate_email_format(email: str) -> bool:
    """Return True when the email looks structurally valid."""
    return bool(EMAIL_RE.match(email))


def normalize_name(name: str) -> str:
    """Collapse whitespace and title-case a display name."""
    return " ".join(name.split()).title()
