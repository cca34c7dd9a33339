/**
 * Tiny observable store: single source of truth for the UI.
 */

import type {
  StoreEvent,
  TaskDto,
  Unsubscribe,
  UserDto,
} from "../types";
import { isTerminal, priorityWeight } from "../types";

export interface AppState {
  session: UserDto | null;
  tasks: TaskDto[];
  loading: boolean;
  error: string | null;
}

type Listener = (event: StoreEvent, state: AppState) => void;

export class Store {
  private state: AppState = {
    session: null,
    tasks: [],
    loading: false,
    error: null,
  };
  private listeners: Set<Listener> = new Set();

  getState(): AppState {
    return this.state;
  }

  subscribe(listener: Listener): Unsubscribe {
    this.listeners.add(listener);
    return () => {
      this.listeners.delete(listener);
    };
  }

  private publish(event: StoreEvent): void {
    for (const listener of this.listeners) {
      listener(event, this.state);
    }
  }

  setSession(user: UserDto | null): void {
    this.state = { ...this.state, session: user };
    this.publish({ kind: "session", payload: user });
  }

  setLoading(loading: boolean): void {
    this.state = { ...this.state, loading };
  }

  setError(message: string | null): void {
    this.state = { ...this.state, error: message };
  }

  replaceTasks(tasks: TaskDto[]): void {
    this.state = { ...this.state, tasks: sortTasks(tasks) };
    this.publish({ kind: "tasks", payload: tasks });
  }

  upsertTask(task: TaskDto): void {
    const rest = this.state.tasks.filter((t) => t.id !== task.id);
    this.replaceTasks([...rest, task]);
  }

  removeTask(id: string): void {
    this.replaceTasks(this.state.tasks.filter((t) => t.id !== id));
  }

  openTasks(): TaskDto[] {
    return this.state.tasks.filter((t) => !isTerminal(t.status));
  }

  myTasks(): TaskDto[] {
    const me = this.state.session;
    if (me === null) {
      return [];
    }
    return this.openTasks().filter((t) => t.assignee === me.id);
  }
}

export function sortTasks(tasks: TaskDto[]): TaskDto[] {
  return [...tasks].sort((a, b) => {
    const byPriority =
      priorityWeight(b.priority) - priorityWeight(a.priority);
    if (byPriority !== 0) {
      return byPriority;
    }
    return b.updated_at - a.updated_at;
  });
}

let globalStore: Store | null = null;

export function getStore(): Store {
  if (globalStore === null) {
    globalStore = new Store();
  }
  return globalStore;
}

export function resetStore(): void {
  globalStore = null;
}
