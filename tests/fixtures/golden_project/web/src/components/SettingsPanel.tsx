/**
 * Settings panel: notification preferences, theme toggle, danger zone.
 */

import React, { useCallback, useEffect, useReducer } from "react";
import { useAuth } from "../hooks/useAuth";
import { getClient } from "../api/client";

type Theme = "light" | "dark" | "system";

interface SettingsState {
  theme: Theme;
  emailDigest: boolean;
  digestHour: number;
  mentionsOnly: boolean;
  saving: boolean;
  savedAt: number | null;
}

type SettingsAction =
  | { kind: "theme"; theme: Theme }
  | { kind: "toggleDigest" }
  | { kind: "digestHour"; hour: number }
  | { kind: "toggleMentions" }
  | { kind: "saving" }
  | { kind: "saved"; at: number };

const initialState: SettingsState = {
  theme: "system",
  emailDigest: true,
  digestHour: 8,
  mentionsOnly: false,
  saving: false,
  savedAt: null,
};

function settingsReducer(
  state: SettingsState,
  action: SettingsAction,
): SettingsState {
  switch (action.kind) {
    case "theme":
      return { ...state, theme: action.theme };
    case "toggleDigest":
      return { ...state, emailDigest: !state.emailDigest };
    case "digestHour": {
      const hour = Math.min(23, Math.max(0, Math.round(action.hour)));
      return { ...state, digestHour: hour };
    }
    case "toggleMentions":
      return { ...state, mentionsOnly: !state.mentionsOnly };
    case "saving":
      return { ...state, saving: true };
    case "saved":
      return { ...state, saving: false, savedAt: action.at };
    default:
      return state;
  }
}

function applyTheme(theme: Theme): void {
  const root = document.documentElement;
  if (theme === "system") {
    root.removeAttribute("data-theme");
  } else {
    root.setAttribute("data-theme", theme);
  }
}

export function SettingsPanel(): JSX.Element {
  const { user, hasRole } = useAuth();
  const [state, dispatch] = useReducer(settingsReducer, initialState);

  useEffect(() => {
    applyTheme(state.theme);
  }, [state.theme]);

  const save = useCallback(async (): Promise<void> => {
    dispatch({ kind: "saving" });
    await getClient().post("/users/preferences", {
      theme: state.theme,
      email_digest: state.emailDigest,
      digest_hour: state.digestHour,
      mentions_only: state.mentionsOnly,
    });
    dispatch({ kind: "saved", at: Date.now() });
  }, [state.theme, state.emailDigest, state.digestHour, state.mentionsOnly]);

  if (user === null) {
    return <div className="settings">Sign in to edit settings.</div>;
  }

  return (
    <div className="settings">
      <h1>Settings</h1>
      <section>
        <h2>Appearance</h2>
        {(["light", "dark", "system"] as Theme[]).map((theme) => (
          <label key={theme}>
            <input
              type="radio"
              checked={state.theme === theme}
              onChange={() => dispatch({ kind: "theme", theme })}
            />
            {theme}
          </label>
        ))}
      </section>
      <section>
        <h2>Notifications</h2>
        <label>
          <input
            type="checkbox"
            checked={state.emailDigest}
            onChange={() => dispatch({ kind: "toggleDigest" })}
          />
          Daily email digest
        </label>
        {state.emailDigest && (
          <input
            type="number"
            min={0}
            max={23}
            value={state.digestHour}
            onChange={(e) =>
              dispatch({ kind: "digestHour", hour: Number(e.target.value) })
            }
          />
        )}
        <label>
          <input
            type="checkbox"
            checked={state.mentionsOnly}
            onChange={() => dispatch({ kind: "toggleMentions" })}
          />
          Only notify on @mentions
        </label>
      </section>
      <footer>
        <button disabled={state.saving} onClick={() => void save()}>
          {state.saving ? "Saving…" : "Save settings"}
        </button>
        {state.savedAt !== null && <small>Saved.</small>}
      </footer>
      {hasRole("admin") && (
        <section className="settings__danger">
          <h2>Danger zone</h2>
          <button className="danger">Export workspace</button>
        </section>
      )}
    </div>
  );
}
