/**
 * Board-style task list grouped by status columns.
 */

import React, { useMemo, useState } from "react";
import { useTasksByStatus } from "../hooks/useTasks";
import type { TaskDto, TaskStatus } from "../types";
import { STATUS_ORDER } from "../types";
import { TaskCard, TaskCardSkeleton } from "./TaskCard";

export interface TaskListProps {
  visibleStatuses?: TaskStatus[];
  filterLabel?: string;
  loading?: boolean;
}

function columnTitle(status: TaskStatus): string {
  return status
    .split("_")
    .map((part) => part[0].toUpperCase() + part.slice(1))
    .join(" ");
}

export function TaskList({
  visibleStatuses,
  filterLabel,
  loading = false,
}: TaskListProps): JSX.Element {
  const buckets = useTasksByStatus();
  const [collapsed, setCollapsed] = useState<Set<TaskStatus>>(new Set());

  const statuses = visibleStatuses ?? STATUS_ORDER.filter(
    (s) => s !== "cancelled",
  );

  const filtered = useMemo(() => {
    if (!filterLabel) {
      return buckets;
    }
    const out = new Map<TaskStatus, TaskDto[]>();
    for (const [status, tasks] of buckets) {
      out.set(
        status,
        tasks.filter((t) => t.labels.includes(filterLabel)),
      );
    }
    return out;
  }, [buckets, filterLabel]);

  const toggle = (status: TaskStatus): void => {
    setCollapsed((prev) => {
      const next = new Set(prev);
      if (next.has(status)) {
        next.delete(status);
      } else {
        next.add(status);
      }
      return next;
    });
  };

  if (loading) {
    return (
      <div className="board board--loading">
        {statuses.map((s) => (
          <TaskCardSkeleton key={s} />
        ))}
      </div>
    );
  }

  return (
    <div className="board">
      {statuses.map((status) => {
        const tasks = filtered.get(status) ?? [];
        const isCollapsed = collapsed.has(status);
        return (
          <section key={status} className="board__column">
            <h2 onClick={() => toggle(status)}>
              {columnTitle(status)}
              <span className="board__count">{tasks.length}</span>
            </h2>
            {!isCollapsed &&
              tasks.map((task) => (
                <TaskCard key={task.id} task={task} compact />
              ))}
          </section>
        );
      })}
    </div>
  );
}
