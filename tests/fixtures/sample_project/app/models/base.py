"""Base model layer."""


class BaseModel:
    """Root of the model hierarchy."""

    def __init__(self, db):
        self.db = db

    def save(self):
        """Persist the record."""
        return self.db.write(self.to_dict())

    def delete(self):
        return self.db.remove(self.key())

    def to_dict(self):
        return {}

    def key(self):
        return id(self)
