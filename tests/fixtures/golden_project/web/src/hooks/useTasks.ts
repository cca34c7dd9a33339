/**
 * React hooks over the task store.
 */

import { useEffect, useMemo, useState } from "react";
import { refreshTasks } from "../store/actions";
import { getStore } from "../store/store";
import type { TaskDto, TaskStatus } from "../types";
import { isTerminal } from "../types";

export interface UseTasksResult {
  tasks: TaskDto[];
  loading: boolean;
  total: number;
  reload: () => Promise<void>;
}

export function useTasks(page = 1): UseTasksResult {
  const store = getStore();
  const [tasks, setTasks] = useState<TaskDto[]>(store.getState().tasks);
  const [loading, setLoading] = useState(false);
  const [total, setTotal] = useState(0);

  useEffect(() => {
    const unsubscribe = store.subscribe((event, state) => {
      if (event.kind === "tasks") {
        setTasks(state.tasks);
      }
    });
    return unsubscribe;
  }, [store]);

  const reload = async (): Promise<void> => {
    setLoading(true);
    const count = await refreshTasks(page);
    setTotal(count);
    setLoading(false);
  };

  useEffect(() => {
    void reload();
    // eslint-disable-next-line react-hooks/exhaustive-deps
  }, [page]);

  return { tasks, loading, total, reload };
}

export function useTasksByStatus(): Map<TaskStatus, TaskDto[]> {
  const { tasks } = useTasks();
  return useMemo(() => {
    const buckets = new Map<TaskStatus, TaskDto[]>();
    for (const task of tasks) {
      const bucket = buckets.get(task.status) ?? [];
      bucket.push(task);
      buckets.set(task.status, bucket);
    }
    return buckets;
  }, [tasks]);
}

export function useOpenTaskCount(): number {
  const { tasks } = useTasks();
  return useMemo(
    () => tasks.filter((t) => !isTerminal(t.status)).length,
    [tasks],
  );
}
