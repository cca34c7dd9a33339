"""Application configuration for taskforge.

Layered settings: defaults, environment overrides, and per-deployment
profiles. Exercises dataclasses, classmethods, and module-level state.
"""

import os
from dataclasses import dataclass, field


DEFAULT_PAGE_SIZE = 25
MAX_PAGE_SIZE = 200
SUPPORTED_LOCALES = ("en", "de", "fr", "ja")


@dataclass
class DatabaseConfig:
    host: str = "localhost"
    port: int = 5432
    name: str = "taskforge"
    pool_min: int = 2
    pool_max: int = 10

    def dsn(self) -> str:
        return f"postgres://{self.host}:{self.port}/{self.name}"

    @classmethod
    def from_env(cls) -> "DatabaseConfig":
        return cls(
            host=os.environ.get("TF_DB_HOST", "localhost"),
            port=int(os.environ.get("TF_DB_PORT", "5432")),
            name=os.environ.get("TF_DB_NAME", "taskforge"),
        )

    def validate(self) -> None:
        if not (0 < self.port < 65536):
            raise ValueError(f"port out of range: {self.port}")
        if self.pool_min > self.pool_max:
            raise ValueError("pool_min exceeds pool_max")


@dataclass
class AuthConfig:
    secret_key: str = "dev-secret"
    token_ttl_seconds: int = 3600
    refresh_ttl_seconds: int = 86400
    allowed_roles: tuple = ("admin", "manager", "member", "viewer")

    def is_role_allowed(self, role: str) -> bool:
        return role in self.allowed_roles

    @classmethod
    def from_env(cls) -> "AuthConfig":
        return cls(
            secret_key=os.environ.get("TF_SECRET", "dev-secret"),
            token_ttl_seconds=int(os.environ.get("TF_TOKEN_TTL", "3600")),
        )


@dataclass
class NotificationConfig:
    enabled: bool = True
    digest_hour: int = 8
    channels: list = field(default_factory=lambda: ["email"])

    def uses_channel(self, channel: str) -> bool:
        return self.enabled and channel in self.channels


@dataclass
class AppConfig:
    database: DatabaseConfig = field(default_factory=DatabaseConfig)
    auth: AuthConfig = field(default_factory=AuthConfig)
    notifications: NotificationConfig = field(
        default_factory=NotificationConfig)
    debug: bool = False
    page_size: int = DEFAULT_PAGE_SIZE

    def validate(self) -> None:
        self.database.validate()
        if self.page_size > MAX_PAGE_SIZE:
            raise ValueError("page_size exceeds MAX_PAGE_SIZE")

    @classmethod
    def load(cls) -> "AppConfig":
        config = cls(
            database=DatabaseConfig.from_env(),
            auth=AuthConfig.from_env(),
            debug=os.environ.get("TF_DEBUG") == "1",
        )
        config.validate()
        return config


_config: AppConfig | None = None


def get_config() -> AppConfig:
    """Process-wide config singleton."""
    global _config
    if _config is None:
        _config = AppConfig.load()
    return _config


def reset_config() -> None:
    global _config
    _config = None
