/**
 * Session hook: login state, role checks, token persistence.
 */

import { useCallback, useEffect, useState } from "react";
import { configureClient, getClient } from "../api/client";
import { loadSession } from "../store/actions";
import { getStore } from "../store/store";
import type { UserDto } from "../types";

const TOKEN_KEY = "taskforge.token";

export interface UseAuthResult {
  user: UserDto | null;
  ready: boolean;
  login: (token: string) => Promise<boolean>;
  logout: () => void;
  hasRole: (minimum: UserDto["role"]) => boolean;
}

const ROLE_ORDER: UserDto["role"][] = [
  "viewer",
  "member",
  "manager",
  "admin",
];

export function useAuth(): UseAuthResult {
  const store = getStore();
  const [user, setUser] = useState<UserDto | null>(
    store.getState().session,
  );
  const [ready, setReady] = useState(false);

  useEffect(() => {
    const unsubscribe = store.subscribe((event, state) => {
      if (event.kind === "session") {
        setUser(state.session);
      }
    });
    const saved = window.localStorage.getItem(TOKEN_KEY);
    if (saved) {
      getClient().setToken(saved);
      void loadSession().finally(() => setReady(true));
    } else {
      setReady(true);
    }
    return unsubscribe;
  }, [store]);

  const login = useCallback(async (token: string): Promise<boolean> => {
    configureClient({ baseUrl: "/api", token });
    const ok = await loadSession();
    if (ok) {
      window.localStorage.setItem(TOKEN_KEY, token);
    }
    return ok;
  }, []);

  const logout = useCallback((): void => {
    window.localStorage.removeItem(TOKEN_KEY);
    getClient().setToken(null);
    store.setSession(null);
  }, [store]);

  const hasRole = useCallback(
    (minimum: UserDto["role"]): boolean => {
      if (user === null) {
        return false;
      }
      return (
        ROLE_ORDER.indexOf(user.role) >= ROLE_ORDER.indexOf(minimum)
      );
    },
    [user],
  );

  return { user, ready, login, logout, hasRole };
}
