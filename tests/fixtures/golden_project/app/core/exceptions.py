"""Exception hierarchy for taskforge.

Every domain error derives from TaskforgeError so handlers can catch the
family; exercises multi-level inheritance and super() chains.
"""


class TaskforgeError(Exception):
    """Root of the application error tree."""

    def __init__(self, message: str, code: str = "internal"):
        super().__init__(message)
        self.message = message
        self.code = code

    def to_dict(self) -> dict:
        return {"error": self.code, "message": self.message}


class ValidationError(TaskforgeError):
    def __init__(self, message: str, field_name: str = ""):
        super().__init__(message, code="validation")
        self.field_name = field_name

    def to_dict(self) -> dict:
        data = super().to_dict()
        if self.field_name:
            data["field"] = self.field_name
        return data


class NotFoundError(TaskforgeError):
    def __init__(self, entity: str, entity_id: str):
        super().__init__(f"{entity} {entity_id} not found", code="not_found")
        self.entity = entity
        self.entity_id = entity_id


class PermissionError_(TaskforgeError):
    def __init__(self, action: str, role: str):
        super().__init__(
            f"role {role} may not {action}", code="forbidden")
        self.action = action
        self.role = role


class ConflictError(TaskforgeError):
    def __init__(self, message: str):
        super().__init__(message, code="conflict")


class QuotaExceededError(ConflictError):
    """A specialization of conflict: too many of something."""

    def __init__(self, resource: str, limit: int):
        super().__init__(f"quota exceeded for {resource} (limit {limit})")
        self.resource = resource
        self.limit = limit


class StorageError(TaskforgeError):
    def __init__(self, message: str, retryable: bool = False):
        super().__init__(message, code="storage")
        self.retryable = retryable


def wrap_storage_failure(exc: Exception) -> StorageError:
    """Normalize any backend failure into a StorageError."""
    if isinstance(exc, StorageError):
        return exc
    retryable = isinstance(exc, (TimeoutError, ConnectionError))
    return StorageError(str(exc), retryable=retryable)
