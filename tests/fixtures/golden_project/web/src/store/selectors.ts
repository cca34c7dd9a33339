/**
 * Pure selectors over AppState — memo-friendly derived views.
 */

import type { AppState } from "./store";
import type { TaskDto, TaskStatus, UserDto } from "../types";
import { isTerminal, priorityWeight, STATUS_ORDER } from "../types";

export interface ColumnView {
  status: TaskStatus;
  tasks: TaskDto[];
  overLimit: boolean;
}

const WIP_LIMITS: Partial<Record<TaskStatus, number>> = {
  in_progress: 5,
  review: 3,
};

export function selectColumns(state: AppState): ColumnView[] {
  return STATUS_ORDER.map((status) => {
    const tasks = state.tasks.filter((t) => t.status === status);
    const limit = WIP_LIMITS[status];
    return {
      status,
      tasks,
      overLimit: limit !== undefined && tasks.length > limit,
    };
  });
}

export function selectUrgent(state: AppState): TaskDto[] {
  return state.tasks
    .filter((t) => !isTerminal(t.status))
    .filter((t) => priorityWeight(t.priority) >= 2)
    .sort((a, b) => priorityWeight(b.priority) - priorityWeight(a.priority));
}

export function selectUnassigned(state: AppState): TaskDto[] {
  return state.tasks.filter(
    (t) => t.assignee === null && !isTerminal(t.status),
  );
}

export function selectProgress(state: AppState): number {
  if (state.tasks.length === 0) {
    return 0;
  }
  const done = state.tasks.filter((t) => t.status === "done").length;
  return done / state.tasks.length;
}

export function selectLabelCloud(
  state: AppState,
): Array<{ label: string; count: number }> {
  const counts = new Map<string, number>();
  for (const task of state.tasks) {
    for (const label of task.labels) {
      counts.set(label, (counts.get(label) ?? 0) + 1);
    }
  }
  return [...counts.entries()]
    .map(([label, count]) => ({ label, count }))
    .sort((a, b) => b.count - a.count);
}

export function canEdit(user: UserDto | null, task: TaskDto): boolean {
  if (user === null || !user.active) {
    return false;
  }
  if (user.role === "admin" || user.role === "manager") {
    return true;
  }
  return task.assignee === user.id;
}
