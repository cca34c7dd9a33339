/**
 * HTTP client with retry, auth header injection, and typed results.
 */

import { ApiError, Result } from "../types";

export interface ClientOptions {
  baseUrl: string;
  token?: string;
  maxRetries?: number;
  timeoutMs?: number;
}

export class ApiClient {
  private baseUrl: string;
  private token: string | null;
  private maxRetries: number;
  private timeoutMs: number;
  requestCount = 0;

  constructor(options: ClientOptions) {
    this.baseUrl = options.baseUrl.replace(/\/+$/, "");
    this.token = options.token ?? null;
    this.maxRetries = options.maxRetries ?? 2;
    this.timeoutMs = options.timeoutMs ?? 10_000;
  }

  setToken(token: string | null): void {
    this.token = token;
  }

  private headers(): Record<string, string> {
    const base: Record<string, string> = {
      "content-type": "application/json",
    };
    if (this.token) {
      base["authorization"] = `Bearer ${this.token}`;
    }
    return base;
  }

  private async rawFetch(
    method: string,
    path: string,
    body?: unknown,
  ): Promise<Response> {
    const controller = new AbortController();
    const timer = setTimeout(() => controller.abort(), this.timeoutMs);
    try {
      this.requestCount += 1;
      return await fetch(`${this.baseUrl}${path}`, {
        method,
        headers: this.headers(),
        body: body === undefined ? undefined : JSON.stringify(body),
        signal: controller.signal,
      });
    } finally {
      clearTimeout(timer);
    }
  }

  async request<T>(
    method: string,
    path: string,
    body?: unknown,
  ): Promise<Result<T>> {
    let lastError: ApiError = { error: "network" };
    for (let attempt = 0; attempt <= this.maxRetries; attempt++) {
      try {
        const response = await this.rawFetch(method, path, body);
        const data = await response.json();
        if (response.ok) {
          return { ok: true, value: data as T };
        }
        lastError = data as ApiError;
        if (response.status < 500) {
          break; // client errors don't retry
        }
      } catch (err) {
        lastError = { error: "network", message: String(err) };
      }
      await sleep(2 ** attempt * 100);
    }
    return { ok: false, error: lastError };
  }

  get<T>(path: string): Promise<Result<T>> {
    return this.request<T>("GET", path);
  }

  post<T>(path: string, body: unknown): Promise<Result<T>> {
    return this.request<T>("POST", path, body);
  }
}

export function sleep(ms: number): Promise<void> {
  return new Promise((resolve) => setTimeout(resolve, ms));
}

let defaultClient: ApiClient | null = null;

export function getClient(): ApiClient {
  if (defaultClient === null) {
    defaultClient = new ApiClient({ baseUrl: "/api" });
  }
  return defaultClient;
}

export function configureClient(options: ClientOptions): ApiClient {
  defaultClient = new ApiClient(options);
  return defaultClient;
}
