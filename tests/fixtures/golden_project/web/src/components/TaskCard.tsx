/**
 * A single task rendered as a card with inline actions.
 */

import React, { useState } from "react";
import { claimTask, moveTask } from "../store/actions";
import type { TaskDto, TaskStatus } from "../types";
import { formatAge, priorityColor } from "../utils/format";

export interface TaskCardProps {
  task: TaskDto;
  compact?: boolean;
  onChanged?: (task: TaskDto) => void;
}

const NEXT_STATUS: Partial<Record<TaskStatus, TaskStatus>> = {
  backlog: "todo",
  todo: "in_progress",
  in_progress: "review",
  review: "done",
};

export function TaskCard({
  task,
  compact = false,
  onChanged,
}: TaskCardProps): JSX.Element {
  const [busy, setBusy] = useState(false);
  const next = NEXT_STATUS[task.status];

  const advance = async (): Promise<void> => {
    if (!next || busy) {
      return;
    }
    setBusy(true);
    const ok = await moveTask(task.id, next);
    setBusy(false);
    if (ok && onChanged) {
      onChanged({ ...task, status: next });
    }
  };

  const claim = async (): Promise<void> => {
    setBusy(true);
    await claimTask(task.id);
    setBusy(false);
  };

  return (
    <div
      className={`task-card ${compact ? "task-card--compact" : ""}`}
      data-status={task.status}
    >
      <header className="task-card__header">
        <span
          className="task-card__priority"
          style={{ backgroundColor: priorityColor(task.priority) }}
        />
        <h3>{task.name}</h3>
      </header>
      {!compact && (
        <p className="task-card__meta">
          {formatAge(task.created_at)} · {task.comments} comments
        </p>
      )}
      <footer className="task-card__actions">
        {task.assignee === null && (
          <button disabled={busy} onClick={() => void claim()}>
            Claim
          </button>
        )}
        {next && (
          <button disabled={busy} onClick={() => void advance()}>
            Move to {next.replace("_", " ")}
          </button>
        )}
      </footer>
      {task.labels.length > 0 && (
        <ul className="task-card__labels">
          {task.labels.map((label) => (
            <li key={label}>{label}</li>
          ))}
        </ul>
      )}
    </div>
  );
}

export function TaskCardSkeleton(): JSX.Element {
  return <div className="task-card task-card--skeleton" aria-busy="true" />;
}
