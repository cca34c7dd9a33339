/**
 * Store actions: async flows coordinating API calls with state updates.
 */

import {
  assignTask,
  createTask,
  fetchInbox,
  fetchProfile,
  fetchTasks,
  transitionTask,
} from "../api/endpoints";
import type { TaskStatus } from "../types";
import { getStore } from "./store";

export async function loadSession(): Promise<boolean> {
  const store = getStore();
  store.setLoading(true);
  const result = await fetchProfile();
  store.setLoading(false);
  if (result.ok) {
    store.setSession(result.value);
    return true;
  }
  store.setSession(null);
  store.setError(result.error.message ?? result.error.error);
  return false;
}

export async function refreshTasks(page = 1): Promise<number> {
  const store = getStore();
  store.setLoading(true);
  const result = await fetchTasks(page);
  store.setLoading(false);
  if (!result.ok) {
    store.setError(result.error.message ?? "failed to load tasks");
    return 0;
  }
  store.replaceTasks(result.value.items);
  return result.value.total;
}

export async function refreshInbox(): Promise<void> {
  const store = getStore();
  const result = await fetchInbox();
  if (result.ok) {
    store.replaceTasks(result.value);
  }
}

export async function addTask(
  title: string,
  priority = 1,
): Promise<boolean> {
  const store = getStore();
  const result = await createTask(title, priority);
  if (result.ok) {
    store.upsertTask(result.value);
    return true;
  }
  store.setError(result.error.message ?? "create failed");
  return false;
}

export async function moveTask(
  id: string,
  to: TaskStatus,
): Promise<boolean> {
  const store = getStore();
  const result = await transitionTask(id, to);
  if (result.ok) {
    store.upsertTask(result.value);
    return true;
  }
  return false;
}

export async function claimTask(id: string): Promise<boolean> {
  const store = getStore();
  const me = store.getState().session;
  if (me === null) {
    return false;
  }
  const result = await assignTask(id, me.username);
  if (result.ok) {
    store.upsertTask(result.value);
  }
  return result.ok;
}
