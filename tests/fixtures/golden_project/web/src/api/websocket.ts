/**
 * Live-update channel: reconnecting websocket with typed message routing.
 */

import { getStore } from "../store/store";
import type { TaskDto, UserDto } from "../types";

export type ServerMessage =
  | { type: "task.updated"; task: TaskDto }
  | { type: "task.deleted"; id: string }
  | { type: "user.updated"; user: UserDto }
  | { type: "ping"; at: number };

type MessageHandler = (message: ServerMessage) => void;

export interface LiveOptions {
  url: string;
  maxBackoffMs?: number;
  onStatus?: (connected: boolean) => void;
}

export class LiveChannel {
  private socket: WebSocket | null = null;
  private handlers: MessageHandler[] = [];
  private attempts = 0;
  private closedByUser = false;
  readonly options: LiveOptions;

  constructor(options: LiveOptions) {
    this.options = options;
  }

  connect(): void {
    this.closedByUser = false;
    this.socket = new WebSocket(this.options.url);
    this.socket.onopen = () => {
      this.attempts = 0;
      this.options.onStatus?.(true);
    };
    this.socket.onmessage = (event) => {
      this.route(JSON.parse(event.data) as ServerMessage);
    };
    this.socket.onclose = () => {
      this.options.onStatus?.(false);
      if (!this.closedByUser) {
        this.scheduleReconnect();
      }
    };
  }

  private scheduleReconnect(): void {
    const cap = this.options.maxBackoffMs ?? 30_000;
    const delay = Math.min(2 ** this.attempts * 250, cap);
    this.attempts += 1;
    setTimeout(() => this.connect(), delay);
  }

  close(): void {
    this.closedByUser = true;
    this.socket?.close();
    this.socket = null;
  }

  onMessage(handler: MessageHandler): () => void {
    this.handlers.push(handler);
    return () => {
      this.handlers = this.handlers.filter((h) => h !== handler);
    };
  }

  private route(message: ServerMessage): void {
    for (const handler of this.handlers) {
      handler(message);
    }
    applyToStore(message);
  }
}

export function applyToStore(message: ServerMessage): void {
  const store = getStore();
  switch (message.type) {
    case "task.updated":
      store.upsertTask(message.task);
      break;
    case "task.deleted":
      store.removeTask(message.id);
      break;
    case "user.updated": {
      const session = store.getState().session;
      if (session !== null && session.id === message.user.id) {
        store.setSession(message.user);
      }
      break;
    }
    case "ping":
      break;
  }
}

export function openLiveChannel(token: string): LiveChannel {
  const channel = new LiveChannel({
    url: `wss://taskforge.local/live?token=${encodeURIComponent(token)}`,
  });
  channel.connect();
  return channel;
}
