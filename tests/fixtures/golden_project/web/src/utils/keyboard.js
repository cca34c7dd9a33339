/**
 * Keyboard shortcut registry (ESM JS): chord parsing + dispatch.
 */

const MODIFIERS = ["ctrl", "alt", "shift", "meta"];

export function parseChord(spec) {
  const parts = String(spec).toLowerCase().split("+");
  const key = parts[parts.length - 1];
  const mods = new Set(parts.slice(0, -1));
  for (const mod of mods) {
    if (!MODIFIERS.includes(mod)) {
      throw new Error(`unknown modifier: ${mod}`);
    }
  }
  return { key, mods };
}

export function matchesEvent(chord, event) {
  if (event.key.toLowerCase() !== chord.key) {
    return false;
  }
  return (
    chord.mods.has("ctrl") === event.ctrlKey &&
    chord.mods.has("alt") === event.altKey &&
    chord.mods.has("shift") === event.shiftKey &&
    chord.mods.has("meta") === event.metaKey
  );
}

export class ShortcutMap {
  constructor() {
    this.bindings = [];
    this.enabled = true;
  }

  bind(spec, handler, description = "") {
    const chord = parseChord(spec);
    this.bindings.push({ spec, chord, handler, description });
    return () => {
      this.bindings = this.bindings.filter((b) => b.handler !== handler);
    };
  }

  dispatch(event) {
    if (!this.enabled) {
      return false;
    }
    for (const binding of this.bindings) {
      if (matchesEvent(binding.chord, event)) {
        event.preventDefault();
        binding.handler(event);
        return true;
      }
    }
    return false;
  }

  help() {
    return this.bindings
      .filter((b) => b.description)
      .map((b) => `${b.spec}: ${b.description}`)
      .join("\n");
  }
}

export function installGlobal(map) {
  const listener = (event) => map.dispatch(event);
  window.addEventListener("keydown", listener);
  return () => window.removeEventListener("keydown", listener);
}
