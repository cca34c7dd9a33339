"""User management service with caching."""
from ..models.user import User, AdminUser
from ..utils.validators import validate_email_format


class UserService:
    """Create, fetch, and authenticate users."""

    def __init__(self, db, cache):
        self.db = db
        self.cache = cache

    def create_user(self, name: str, email: str) -> User:
        """Register a new user after validating the email."""
        if not validate_email_format(email):
            raise ValueError("bad email")
        user = User(self.db, name, email)
        user.save()
        return user

    def get_user(self, user_id: int) -> User:
        """Fetch a user by id, reading through the cache."""
        cached = self.cache.get(user_id)
        if cached:
            return cached
        user = self.db.load(user_id)
        self.cache.put(user_id, user)
        return user

    def promote(self, user: User) -> AdminUser:
        admin = AdminUser(self.db, user.name, user.email)
        admin.save()
        return admin
