"""HTTP route handlers."""
from ..services.user_service import UserService


def handle_create_user(request, service: UserService):
    """POST /users endpoint: create a user account."""
    body = request.json()
    user = service.create_user(body["name"], body["email"])
    return {"id": user.key(), "name": user.name}


def handle_get_user(request, service: UserService):
    """GET /users/{id} endpoint."""
    user = service.get_user(int(request.params["id"]))
    return user.to_dict()
