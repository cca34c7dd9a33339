/**
 * Shared domain types for the taskforge frontend.
 */

export type TaskStatus =
  | "backlog"
  | "todo"
  | "in_progress"
  | "review"
  | "done"
  | "cancelled";

export type PriorityLabel = "low" | "normal" | "high" | "urgent";

export type EntityId = string;

export interface TaskDto {
  id: EntityId;
  name: string;
  status: TaskStatus;
  priority: PriorityLabel;
  assignee: EntityId | null;
  labels: string[];
  comments: number;
  created_at: number;
  updated_at: number;
}

export interface UserDto {
  id: EntityId;
  username: string;
  email: string;
  role: "admin" | "manager" | "member" | "viewer";
  active: boolean;
  initials?: string;
}

export interface ProjectDto {
  id: EntityId;
  name: string;
  description: string;
  tasks: number;
  completion: number;
}

export interface PageInfo {
  page: number;
  size: number;
  total: number;
}

export interface Paged<T> {
  items: T[];
  total: number;
}

export interface ApiError {
  error: string;
  message?: string;
}

export type Result<T> =
  | { ok: true; value: T }
  | { ok: false; error: ApiError };

export interface StoreEvent {
  kind: "tasks" | "users" | "projects" | "session";
  payload: unknown;
}

export type Unsubscribe = () => void;

export const STATUS_ORDER: TaskStatus[] = [
  "backlog",
  "todo",
  "in_progress",
  "review",
  "done",
  "cancelled",
];

export function isTerminal(status: TaskStatus): boolean {
  return status === "done" || status === "cancelled";
}

export function priorityWeight(label: PriorityLabel): number {
  switch (label) {
    case "urgent":
      return 3;
    case "high":
      return 2;
    case "normal":
      return 1;
    default:
      return 0;
  }
}
