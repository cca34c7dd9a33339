"""User domain models: roles, accounts, admin escalation.

Inheritance chain: Entity -> NamedEntity -> User -> AdminUser; exercises
enum-like constants, property overrides, and cross-module validator calls.
"""

from app.core.exceptions import PermissionError_, ValidationError
from app.models.base import AuditLog, NamedEntity
from app.utils.validators import validate_email, validate_username


class Role:
    ADMIN = "admin"
    MANAGER = "manager"
    MEMBER = "member"
    VIEWER = "viewer"

    ORDER = (VIEWER, MEMBER, MANAGER, ADMIN)

    @classmethod
    def at_least(cls, role: str, minimum: str) -> bool:
        return cls.ORDER.index(role) >= cls.ORDER.index(minimum)


class User(NamedEntity):
    id_prefix = "usr"

    def __init__(self, username: str, email: str, display_name: str = "",
                 role: str = Role.MEMBER):
        super().__init__(display_name or username)
        self.username = username
        self.email = email
        self.role = role
        self.active = True
        self.audit = AuditLog()
        self._preferences: dict = {}

    def validate(self) -> None:
        super().validate()
        validate_username(self.username)
        validate_email(self.email)
        if self.role not in Role.ORDER:
            raise ValidationError(f"unknown role {self.role}",
                                  field_name="role")

    def deactivate(self, actor: str) -> None:
        self.active = False
        self.audit.record(actor, "deactivate")
        self.touch()

    def set_preference(self, key: str, value) -> None:
        self._preferences[key] = value
        self.touch()

    def get_preference(self, key: str, default=None):
        return self._preferences.get(key, default)

    def can(self, action: str) -> bool:
        """Capability check by role tier."""
        if action in ("view",):
            return True
        if action in ("comment", "create_task"):
            return Role.at_least(self.role, Role.MEMBER)
        if action in ("assign", "close_project"):
            return Role.at_least(self.role, Role.MANAGER)
        return Role.at_least(self.role, Role.ADMIN)

    def require(self, action: str) -> None:
        if not self.can(action):
            raise PermissionError_(action, self.role)

    def to_dict(self) -> dict:
        data = super().to_dict()
        data.update({
            "username": self.username,
            "email": self.email,
            "role": self.role,
            "active": self.active,
        })
        return data


class AdminUser(User):
    """Admins carry an escalation log and can impersonate."""

    def __init__(self, username: str, email: str, display_name: str = ""):
        super().__init__(username, email, display_name, role=Role.ADMIN)
        self.impersonating: str | None = None

    def impersonate(self, user: User) -> None:
        self.impersonating = user.id
        self.audit.record(self.username, "impersonate", user.id)

    def stop_impersonating(self) -> None:
        self.impersonating = None

    def can(self, action: str) -> bool:
        return True  # admins can do everything


class Team:
    """A named group of users with a lead."""

    def __init__(self, name: str, lead: User):
        self.name = name
        self.lead = lead
        self.members: list = [lead]

    def add_member(self, user: User) -> None:
        if user not in self.members:
            self.members.append(user)

    def remove_member(self, user: User) -> None:
        if user is self.lead:
            raise ValidationError("cannot remove the team lead")
        if user in self.members:
            self.members.remove(user)

    def member_emails(self) -> list:
        return [m.email for m in self.members if m.active]

    def managers(self) -> list:
        return [m for m in self.members
                if Role.at_least(m.role, Role.MANAGER)]
