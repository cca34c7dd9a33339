"""Configurable workflow definitions: custom status graphs per project.

Exercises graph-shaped data structures, iterators, and classmethod
factories referencing sibling models.
"""

from app.core.exceptions import ConflictError, ValidationError
from app.models.base import NamedEntity
from app.models.task import Status, Task


class WorkflowStep:
    def __init__(self, name: str, terminal: bool = False):
        self.name = name
        self.terminal = terminal
        self.next_steps: list = []

    def allow(self, step: "WorkflowStep") -> "WorkflowStep":
        if step not in self.next_steps:
            self.next_steps.append(step)
        return self

    def can_reach(self, name: str, _seen=None) -> bool:
        """DFS reachability over the step graph."""
        seen = _seen if _seen is not None else set()
        if self.name == name:
            return True
        seen.add(self.name)
        for step in self.next_steps:
            if step.name not in seen and step.can_reach(name, seen):
                return True
        return False


class Workflow(NamedEntity):
    id_prefix = "wfl"

    def __init__(self, name: str):
        super().__init__(name)
        self.steps: dict = {}
        self.initial: WorkflowStep | None = None

    def add_step(self, name: str, terminal: bool = False) -> WorkflowStep:
        if name in self.steps:
            raise ConflictError(f"duplicate step {name}")
        step = WorkflowStep(name, terminal)
        self.steps[name] = step
        if self.initial is None:
            self.initial = step
        return step

    def connect(self, src: str, dst: str) -> None:
        if src not in self.steps or dst not in self.steps:
            raise ValidationError(f"unknown step in {src}->{dst}")
        self.steps[src].allow(self.steps[dst])

    def validate(self) -> None:
        super().validate()
        if self.initial is None:
            raise ValidationError("workflow has no steps")
        unreachable = [
            name for name in self.steps
            if not self.initial.can_reach(name)
        ]
        if unreachable:
            raise ValidationError(
                f"unreachable steps: {sorted(unreachable)}")

    def terminals(self) -> list:
        return [s.name for s in self.steps.values() if s.terminal]

    def allowed_from(self, name: str) -> list:
        step = self.steps.get(name)
        if step is None:
            return []
        return [s.name for s in step.next_steps]

    @classmethod
    def standard(cls) -> "Workflow":
        """The built-in workflow mirroring Status.TRANSITIONS."""
        flow = cls("standard")
        for status, targets in Status.TRANSITIONS.items():
            if status not in flow.steps:
                flow.add_step(status, terminal=not targets)
        for status, targets in Status.TRANSITIONS.items():
            for target in targets:
                if target not in flow.steps:
                    flow.add_step(target)
                flow.connect(status, target)
        return flow

    @classmethod
    def kanban(cls) -> "Workflow":
        flow = cls("kanban")
        todo = flow.add_step("todo")
        doing = flow.add_step("doing")
        done = flow.add_step("done", terminal=True)
        todo.allow(doing)
        doing.allow(done)
        doing.allow(todo)
        return flow


class WorkflowBinding:
    """Associates a workflow with tasks and enforces its transitions."""

    def __init__(self, workflow: Workflow):
        workflow.validate()
        self.workflow = workflow
        self.positions: dict = {}

    def enter(self, task: Task) -> None:
        assert self.workflow.initial is not None
        self.positions[task.id] = self.workflow.initial.name

    def advance(self, task: Task, target: str) -> str:
        current = self.positions.get(task.id)
        if current is None:
            raise ConflictError(f"task {task.id} not in workflow")
        if target not in self.workflow.allowed_from(current):
            raise ConflictError(
                f"step {target} not allowed from {current}")
        self.positions[task.id] = target
        return target

    def finished(self) -> list:
        ends = set(self.workflow.terminals())
        return [tid for tid, pos in self.positions.items() if pos in ends]
