/**
 * Declarative form state for task creation/editing: field specs,
 * validators, and a tiny dirty-tracking state machine.
 */

import type { PriorityLabel } from "../types";

export interface FieldSpec<T> {
  name: string;
  label: string;
  required?: boolean;
  validate?: (value: T) => string | null;
  defaultValue: T;
}

export interface FieldState<T> {
  value: T;
  touched: boolean;
  error: string | null;
}

export interface TaskFormValues {
  title: string;
  description: string;
  priority: PriorityLabel;
  labels: string[];
  dueInDays: number | null;
}

export function titleValidator(value: string): string | null {
  const trimmed = value.trim();
  if (trimmed.length === 0) {
    return "title is required";
  }
  if (trimmed.length > 120) {
    return "title is longer than 120 characters";
  }
  return null;
}

export function dueValidator(value: number | null): string | null {
  if (value === null) {
    return null;
  }
  if (!Number.isFinite(value) || value < 0) {
    return "due date must be in the future";
  }
  if (value > 365) {
    return "no planning more than a year out";
  }
  return null;
}

export function labelsValidator(labels: string[]): string | null {
  if (labels.length > 8) {
    return "at most 8 labels";
  }
  for (const label of labels) {
    if (!/^[a-z0-9-]+$/.test(label)) {
      return `invalid label: ${label}`;
    }
  }
  return null;
}

export const TASK_FIELDS: Array<FieldSpec<unknown>> = [
  {
    name: "title",
    label: "Title",
    required: true,
    validate: titleValidator as (v: unknown) => string | null,
    defaultValue: "",
  },
  { name: "description", label: "Description", defaultValue: "" },
  { name: "priority", label: "Priority", defaultValue: "normal" },
  {
    name: "labels",
    label: "Labels",
    validate: labelsValidator as (v: unknown) => string | null,
    defaultValue: [],
  },
  {
    name: "dueInDays",
    label: "Due (days)",
    validate: dueValidator as (v: unknown) => string | null,
    defaultValue: null,
  },
];

export class FormState {
  private fields = new Map<string, FieldState<unknown>>();
  submitted = false;

  constructor(specs: Array<FieldSpec<unknown>> = TASK_FIELDS) {
    for (const spec of specs) {
      this.fields.set(spec.name, {
        value: spec.defaultValue,
        touched: false,
        error: null,
      });
    }
  }

  setValue(name: string, value: unknown): void {
    const state = this.fields.get(name);
    if (!state) {
      return;
    }
    state.value = value;
    state.touched = true;
    const spec = TASK_FIELDS.find((s) => s.name === name);
    state.error = spec?.validate ? spec.validate(value) : null;
  }

  value<T>(name: string): T {
    return this.fields.get(name)?.value as T;
  }

  errors(): Record<string, string> {
    const out: Record<string, string> = {};
    for (const [name, state] of this.fields) {
      if (state.error) {
        out[name] = state.error;
      }
    }
    return out;
  }

  isDirty(): boolean {
    return [...this.fields.values()].some((f) => f.touched);
  }

  isValid(): boolean {
    for (const spec of TASK_FIELDS) {
      const state = this.fields.get(spec.name);
      if (!state) {
        continue;
      }
      if (spec.required && !state.value) {
        return false;
      }
      if (spec.validate && spec.validate(state.value) !== null) {
        return false;
      }
    }
    return true;
  }

  toValues(): TaskFormValues {
    return {
      title: this.value<string>("title"),
      description: this.value<string>("description"),
      priority: this.value<PriorityLabel>("priority"),
      labels: this.value<string[]>("labels"),
      dueInDays: this.value<number | null>("dueInDays"),
    };
  }
}
