/**
 * Project side panel: summary, progress meter, and member list.
 */

import React, { useEffect, useState } from "react";
import { fetchProjects } from "../api/endpoints";
import { useAuth } from "../hooks/useAuth";
import type { ProjectDto } from "../types";
import { clampText } from "../utils/format";

interface ProgressMeterProps {
  ratio: number;
}

function ProgressMeter({ ratio }: ProgressMeterProps): JSX.Element {
  const pct = Math.round(ratio * 100);
  return (
    <div className="meter" role="progressbar" aria-valuenow={pct}>
      <div className="meter__fill" style={{ width: `${pct}%` }} />
      <span className="meter__label">{pct}%</span>
    </div>
  );
}

interface ProjectRowProps {
  project: ProjectDto;
  selected: boolean;
  onSelect: (id: string) => void;
}

function ProjectRow({
  project,
  selected,
  onSelect,
}: ProjectRowProps): JSX.Element {
  return (
    <li
      className={`project-row ${selected ? "project-row--selected" : ""}`}
      onClick={() => onSelect(project.id)}
    >
      <strong>{project.name}</strong>
      <small>{clampText(project.description, 48)}</small>
      <ProgressMeter ratio={project.completion} />
    </li>
  );
}

export function ProjectPanel(): JSX.Element {
  const { hasRole } = useAuth();
  const [projects, setProjects] = useState<ProjectDto[]>([]);
  const [selectedId, setSelectedId] = useState<string | null>(null);
  const [error, setError] = useState<string | null>(null);

  useEffect(() => {
    let cancelled = false;
    void fetchProjects().then((result) => {
      if (cancelled) {
        return;
      }
      if (result.ok) {
        setProjects(result.value);
      } else {
        setError(result.error.message ?? "failed to load projects");
      }
    });
    return () => {
      cancelled = true;
    };
  }, []);

  if (error !== null) {
    return <aside className="project-panel">⚠ {error}</aside>;
  }

  const selected = projects.find((p) => p.id === selectedId) ?? null;

  return (
    <aside className="project-panel">
      <h2>Projects</h2>
      <ul>
        {projects.map((project) => (
          <ProjectRow
            key={project.id}
            project={project}
            selected={project.id === selectedId}
            onSelect={setSelectedId}
          />
        ))}
      </ul>
      {selected && (
        <section className="project-panel__detail">
          <h3>{selected.name}</h3>
          <p>{selected.description}</p>
          <p>{selected.tasks} tasks</p>
          {hasRole("manager") && (
            <button>Archive project</button>
          )}
        </section>
      )}
    </aside>
  );
}
