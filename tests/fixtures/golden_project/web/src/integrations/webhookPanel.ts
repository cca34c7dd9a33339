/**
 * Webhook settings panel model: list, toggle, and test-fire endpoints.
 * Exercises: interface + type alias + enum-ish const map, a class
 * calling through an injected ApiClient, and standalone helpers.
 */

import { ApiClient } from "../api/client";
import { Result } from "../types";

export interface WebhookRow {
  name: string;
  url: string;
  events: string[];
  disabled: boolean;
  failures: number;
}

export interface TestFireReport {
  name: string;
  ok: boolean;
  latencyMs: number;
}

export type PanelState = "loading" | "ready" | "saving" | "error";

export const EVENT_LABELS: Record<string, string> = {
  "tasks.created": "Task created",
  "tasks.completed": "Task completed",
  "team.announcement": "Team announcement",
  "*": "Everything",
};

export function describeEvents(row: WebhookRow): string {
  const labels = row.events.map((e) => EVENT_LABELS[e] ?? e);
  return labels.length > 2
    ? `${labels.slice(0, 2).join(", ")} +${labels.length - 2}`
    : labels.join(", ");
}

export function healthBadge(row: WebhookRow): string {
  if (row.disabled) return "disabled";
  if (row.failures > 0) return `flaky (${row.failures})`;
  return "healthy";
}

export class WebhookPanel {
  private client: ApiClient;
  state: PanelState = "loading";
  rows: WebhookRow[] = [];
  lastError: string | null = null;

  constructor(client: ApiClient) {
    this.client = client;
  }

  async refresh(): Promise<WebhookRow[]> {
    this.state = "loading";
    const result: Result<WebhookRow[]> =
      await this.client.get("/integrations/webhooks");
    if (!result.ok) {
      this.state = "error";
      this.lastError = result.error.message ?? result.error.error;
      return [];
    }
    this.rows = result.value;
    this.state = "ready";
    return this.rows;
  }

  async toggle(name: string): Promise<boolean> {
    const row = this.rows.find((r) => r.name === name);
    if (!row) return false;
    this.state = "saving";
    const result = await this.client.post(
      `/integrations/webhooks/${name}/toggle`,
      { disabled: !row.disabled },
    );
    if (result.ok) {
      row.disabled = !row.disabled;
      this.state = "ready";
      return true;
    }
    this.state = "error";
    this.lastError = result.error.message ?? result.error.error;
    return false;
  }

  async testFire(name: string): Promise<TestFireReport> {
    const started = Date.now();
    const result = await this.client.post(
      `/integrations/webhooks/${name}/test`,
      { event: "tasks.completed" },
    );
    return {
      name,
      ok: result.ok,
      latencyMs: Date.now() - started,
    };
  }

  flakyRows(): WebhookRow[] {
    return this.rows.filter((r) => healthBadge(r) !== "healthy");
  }
}
