"""User management use-cases."""

from app.core.exceptions import ConflictError, NotFoundError
from app.core.registry import register_service
from app.db.memory import Database
from app.models.user import AdminUser, Role, User
from app.services.base import BaseService
from app.utils.validators import validate_email, validate_username


@register_service("users")
class UserService(BaseService):
    service_name = "users"

    def register_user(self, username: str, email: str,
                      display_name: str = "", role: str = Role.MEMBER
                      ) -> User:
        validate_username(username)
        validate_email(email)
        if self.db.users.by_username(username) is not None:
            raise ConflictError(f"username taken: {username}")
        if role == Role.ADMIN:
            user: User = AdminUser(username, email, display_name)
        else:
            user = User(username, email, display_name, role=role)
        self.db.users.save(user)
        self._emit("registered", {"id": user.id, "username": username})
        return user

    def get_user(self, user_id: str) -> User:
        return self.db.users.get(user_id)

    def find_by_username(self, username: str) -> User:
        user = self.db.users.by_username(username)
        if user is None:
            raise NotFoundError("user", username)
        return user

    def change_role(self, actor: User, user_id: str, new_role: str) -> User:
        self._require_actor(actor, "manage_users")
        user = self.get_user(user_id)
        user.role = new_role
        user.validate()
        self.db.users.save(user)
        self._emit("role_changed", {"id": user.id, "role": new_role})
        return user

    def deactivate(self, actor: User, user_id: str) -> None:
        self._require_actor(actor, "manage_users")
        user = self.get_user(user_id)
        user.deactivate(actor.username)
        self.db.users.save(user)
        self._emit("deactivated", {"id": user.id})

    def update_email(self, user_id: str, email: str) -> User:
        user = self.get_user(user_id)
        user.email = validate_email(email)
        user.touch()
        self.db.users.save(user)
        return user

    def search(self, text: str, limit: int = 20) -> list:
        needle = text.lower()
        hits = [
            u for u in self.db.users.active_users()
            if needle in u.username or needle in u.name.lower()
            or needle in u.email
        ]
        hits.sort(key=lambda u: (u.username != needle, u.username))
        return hits[:limit]


def bootstrap_admin(db: Database) -> AdminUser:
    """Create the first admin account if none exists."""
    service = UserService(db)
    existing = [u for u in db.users.active_users()
                if isinstance(u, AdminUser)]
    if existing:
        return existing[0]
    admin = service.register_user(
        "root", "root@taskforge.local", "Root Admin", role=Role.ADMIN)
    return admin
