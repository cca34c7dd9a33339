/**
 * Typed endpoint wrappers over the ApiClient.
 */

import { getClient } from "./client";
import type {
  Paged,
  ProjectDto,
  Result,
  TaskDto,
  TaskStatus,
  UserDto,
} from "../types";

export async function fetchTasks(
  page = 1,
  size = 25,
): Promise<Result<Paged<TaskDto>>> {
  return getClient().get<Paged<TaskDto>>(
    `/tasks?page=${page}&size=${size}`,
  );
}

export async function fetchInbox(): Promise<Result<TaskDto[]>> {
  return getClient().get<TaskDto[]>("/tasks/inbox");
}

export async function createTask(
  title: string,
  priority = 1,
  description = "",
): Promise<Result<TaskDto>> {
  return getClient().post<TaskDto>("/tasks", {
    title,
    priority,
    description,
  });
}

export async function transitionTask(
  id: string,
  to: TaskStatus,
): Promise<Result<TaskDto>> {
  return getClient().post<TaskDto>("/tasks/transition", { id, to });
}

export async function assignTask(
  id: string,
  assignee: string,
): Promise<Result<TaskDto>> {
  return getClient().post<TaskDto>("/tasks/assign", { id, assignee });
}

export async function fetchProfile(): Promise<Result<UserDto>> {
  return getClient().get<UserDto>("/users/me");
}

export async function searchUsers(
  query: string,
): Promise<Result<UserDto[]>> {
  const q = encodeURIComponent(query);
  return getClient().get<UserDto[]>(`/users/search?q=${q}`);
}

export async function fetchProjects(): Promise<Result<ProjectDto[]>> {
  return getClient().get<ProjectDto[]>("/projects");
}

export async function taskStats(): Promise<
  Result<Record<TaskStatus, number>>
> {
  return getClient().get<Record<TaskStatus, number>>("/tasks/stats");
}
