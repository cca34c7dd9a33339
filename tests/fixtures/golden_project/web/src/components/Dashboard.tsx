/**
 * Top-level dashboard: session gate, stats row, and the board.
 */

import React, { useEffect, useState } from "react";
import { useAuth } from "../hooks/useAuth";
import { useOpenTaskCount, useTasks } from "../hooks/useTasks";
import { taskStats } from "../api/endpoints";
import type { TaskStatus } from "../types";
import { TaskList } from "./TaskList";

interface StatTileProps {
  label: string;
  value: number | string;
  tone?: "normal" | "warning";
}

function StatTile({
  label,
  value,
  tone = "normal",
}: StatTileProps): JSX.Element {
  return (
    <div className={`stat-tile stat-tile--${tone}`}>
      <span className="stat-tile__value">{value}</span>
      <span className="stat-tile__label">{label}</span>
    </div>
  );
}

export function Dashboard(): JSX.Element {
  const { user, ready, hasRole, logout } = useAuth();
  const { loading, total } = useTasks();
  const openCount = useOpenTaskCount();
  const [stats, setStats] = useState<Record<string, number>>({});

  useEffect(() => {
    let cancelled = false;
    void taskStats().then((result) => {
      if (!cancelled && result.ok) {
        setStats(result.value);
      }
    });
    return () => {
      cancelled = true;
    };
  }, [total]);

  if (!ready) {
    return <div className="dashboard dashboard--booting">Loading…</div>;
  }

  if (user === null) {
    return (
      <div className="dashboard dashboard--anonymous">
        <h1>taskforge</h1>
        <p>Sign in to see your board.</p>
      </div>
    );
  }

  const review = stats["review"] ?? 0;

  return (
    <div className="dashboard">
      <header className="dashboard__header">
        <h1>Welcome back, {user.username}</h1>
        <button onClick={logout}>Sign out</button>
      </header>
      <div className="dashboard__stats">
        <StatTile label="open" value={openCount} />
        <StatTile label="total" value={total} />
        <StatTile
          label="awaiting review"
          value={review}
          tone={review > 5 ? "warning" : "normal"}
        />
      </div>
      <TaskList
        loading={loading}
        visibleStatuses={boardColumnsFor(user.role)}
      />
      {hasRole("manager") && (
        <footer className="dashboard__admin">
          <a href="/reports">Team reports</a>
        </footer>
      )}
    </div>
  );
}

function boardColumnsFor(role: string): TaskStatus[] {
  if (role === "viewer") {
    return ["in_progress", "review", "done"];
  }
  return ["backlog", "todo", "in_progress", "review", "done"];
}
