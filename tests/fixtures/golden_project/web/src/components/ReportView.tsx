/**
 * Reports screen: burndown summary and label cloud built from selectors.
 */

import React, { useEffect, useMemo, useState } from "react";
import { getStore } from "../store/store";
import {
  selectLabelCloud,
  selectProgress,
  selectUnassigned,
  selectUrgent,
} from "../store/selectors";
import type { TaskDto } from "../types";
import { statusEmoji } from "../utils/format";

const { legendLine } = require("../legacy/helpers");

interface LabelChipProps {
  label: string;
  count: number;
  max: number;
}

function LabelChip({ label, count, max }: LabelChipProps): JSX.Element {
  const scale = 0.8 + (count / Math.max(max, 1)) * 0.7;
  return (
    <span className="chip" style={{ fontSize: `${scale}em` }}>
      {label} ({count})
    </span>
  );
}

function UrgentRow({ task }: { task: TaskDto }): JSX.Element {
  return (
    <tr>
      <td>{statusEmoji(task.status)}</td>
      <td>{task.name}</td>
      <td>{task.priority}</td>
      <td>{task.assignee ?? "unassigned"}</td>
    </tr>
  );
}

export function ReportView(): JSX.Element {
  const store = getStore();
  const [tick, setTick] = useState(0);

  useEffect(
    () => store.subscribe(() => setTick((t) => t + 1)),
    [store],
  );

  const state = store.getState();
  const progress = useMemo(() => selectProgress(state), [state, tick]);
  const urgent = useMemo(() => selectUrgent(state), [state, tick]);
  const unassigned = useMemo(() => selectUnassigned(state), [state, tick]);
  const cloud = useMemo(() => selectLabelCloud(state), [state, tick]);
  const maxCount = cloud.length > 0 ? cloud[0].count : 1;

  return (
    <main className="report">
      <h1>Delivery report</h1>
      <p className="report__legend">
        {legendLine(["todo", "in_progress", "review", "done"])}
      </p>
      <section>
        <h2>Progress</h2>
        <progress value={progress} max={1} />
        <span>{Math.round(progress * 100)}% complete</span>
      </section>
      <section>
        <h2>Urgent ({urgent.length})</h2>
        <table>
          <tbody>
            {urgent.map((task) => (
              <UrgentRow key={task.id} task={task} />
            ))}
          </tbody>
        </table>
      </section>
      <section>
        <h2>Unassigned</h2>
        <ul>
          {unassigned.map((task) => (
            <li key={task.id}>{task.name}</li>
          ))}
        </ul>
      </section>
      <section>
        <h2>Labels</h2>
        <div className="report__cloud">
          {cloud.map(({ label, count }) => (
            <LabelChip
              key={label}
              label={label}
              count={count}
              max={maxCount}
            />
          ))}
        </div>
      </section>
    </main>
  );
}
