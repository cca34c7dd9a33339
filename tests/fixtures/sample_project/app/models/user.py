"""User domain model."""
from .base import BaseModel


class User(BaseModel):
    """A registered user account."""

    def __init__(self, db, name: str, email: str):
        super().__init__(db)
        self.name = name
        self.email = email

    def to_dict(self):
        return {"name": self.name, "email": self.email}

    def validate_email(self) -> bool:
        """Check the email address format."""
        return "@" in self.email


class AdminUser(User):
    """A user with elevated permissions."""

    def grant(self, permission: str):
        self.permissions.append(permission)
        self.save()
