"""Field validators shared across models and API handlers."""

import re

from app.core.exceptions import ValidationError

EMAIL_RE = re.compile(r"^[\w.+-]+@[\w-]+(\.[\w-]+)+$")
USERNAME_RE = re.compile(r"^[a-z][a-z0-9_]{2,31}$")
SLUG_RE = re.compile(r"^[a-z0-9][a-z0-9-]*$")
HEX_COLOR_RE = re.compile(r"^#[0-9a-fA-F]{6}$")


def validate_email(value: str) -> str:
    if not value or not EMAIL_RE.match(value):
        raise ValidationError(f"invalid email: {value!r}",
                              field_name="email")
    return value.lower()


def validate_username(value: str) -> str:
    if not value or not USERNAME_RE.match(value):
        raise ValidationError(
            "username must be 3-32 chars, lowercase, start with a letter",
            field_name="username")
    return value


def validate_slug(value: str) -> str:
    if not SLUG_RE.match(value or ""):
        raise ValidationError(f"invalid slug: {value!r}", field_name="slug")
    return value


def validate_color(value: str) -> str:
    if not HEX_COLOR_RE.match(value or ""):
        raise ValidationError(f"invalid color: {value!r}",
                              field_name="color")
    return value.lower()


def validate_priority(value: int) -> int:
    if not isinstance(value, int) or not (0 <= value <= 3):
        raise ValidationError("priority must be an int in [0, 3]",
                              field_name="priority")
    return value


def validate_page(page: int, size: int, max_size: int = 200) -> tuple:
    if page < 1:
        raise ValidationError("page starts at 1", field_name="page")
    if not (1 <= size <= max_size):
        raise ValidationError(f"size must be in [1, {max_size}]",
                              field_name="size")
    return page, size


def coerce_bool(value) -> bool:
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        return value.strip().lower() in ("1", "true", "yes", "on")
    return bool(value)


def non_empty(value: str, field_name: str) -> str:
    if value is None or not str(value).strip():
        raise ValidationError(f"{field_name} required",
                              field_name=field_name)
    return str(value).strip()
