"""Metadata models.

Parity target: reference `src/lattice/metadata/models.py:11-97` — recursive
`FolderNode`, `CoreFeature`, `TechStack`, `DependencyInfo`, `EntryPoint`,
`ProjectMetadata`, `MetadataStatus`.
"""

from __future__ import annotations

import enum
from typing import Any, Optional

from pydantic import BaseModel, Field


class MetadataStatus(str, enum.Enum):
    """Reference: `models.py:90-97`."""

    PENDING = "pending"
    GENERATING = "generating"
    COMPLETED = "completed"
    FAILED = "failed"
    PARTIAL = "partial"


class FolderNode(BaseModel):
    """Recursive folder tree. Reference: `models.py:11-22`."""

    name: str
    type: str = "directory"          # directory | file
    purpose: str | None = None
    children: list["FolderNode"] = Field(default_factory=list)


class TechStack(BaseModel):
    """Reference: `models.py:25-36`."""

    languages: dict[str, int] = Field(default_factory=dict)   # lang -> files
    frameworks: list[str] = Field(default_factory=list)
    build_tools: list[str] = Field(default_factory=list)
    test_frameworks: list[str] = Field(default_factory=list)
    runtimes: list[str] = Field(default_factory=list)


class DependencyInfo(BaseModel):
    """Reference: `models.py:39-49`."""

    name: str
    version: str | None = None
    kind: str = "runtime"            # runtime | dev | build
    source: str = ""                 # which manifest declared it


class EntryPoint(BaseModel):
    """Reference: `models.py:52-61`."""

    name: str
    path: str
    kind: str = "cli"                # cli | main | script | server | export
    description: str | None = None


class CoreFeature(BaseModel):
    """Reference: `models.py:64-72`."""

    name: str
    description: str
    key_entities: list[str] = Field(default_factory=list)
    files: list[str] = Field(default_factory=list)


class ProjectMetadata(BaseModel):
    """Reference: `models.py:75-87` (7 fields + bookkeeping)."""

    project_name: str
    folder_structure: Optional[FolderNode] = None
    tech_stack: Optional[TechStack] = None
    dependencies: list[DependencyInfo] = Field(default_factory=list)
    entry_points: list[EntryPoint] = Field(default_factory=list)
    core_features: list[CoreFeature] = Field(default_factory=list)
    project_overview: str | None = None
    architecture_diagram: str | None = None     # mermaid source
    status: MetadataStatus = MetadataStatus.PENDING
    version: int = 1
    generator: str = "local"
    field_timings_ms: dict[str, float] = Field(default_factory=dict)

    def to_record(self) -> dict[str, Any]:
        return self.model_dump(mode="json")
