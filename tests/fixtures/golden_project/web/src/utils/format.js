/**
 * Presentation helpers shared by components (ESM JavaScript).
 */

const PRIORITY_COLORS = {
  low: "#8a9ba8",
  normal: "#4a90d9",
  high: "#e6a23c",
  urgent: "#d9534f",
};

export function priorityColor(label) {
  return PRIORITY_COLORS[label] || PRIORITY_COLORS.normal;
}

export function formatAge(createdAt) {
  const seconds = Date.now() / 1000 - createdAt;
  if (seconds < 3600) {
    return `${Math.max(1, Math.floor(seconds / 60))}m old`;
  }
  if (seconds < 86400) {
    return `${Math.floor(seconds / 3600)}h old`;
  }
  return `${Math.floor(seconds / 86400)}d old`;
}

export function clampText(text, limit = 60) {
  if (!text || text.length <= limit) {
    return text || "";
  }
  return text.slice(0, limit - 1) + "…";
}

export const statusEmoji = (status) => {
  switch (status) {
    case "done":
      return "✅";
    case "in_progress":
      return "🔨";
    case "review":
      return "👀";
    case "cancelled":
      return "🚫";
    default:
      return "📋";
  }
};

export function groupBy(items, keyFn) {
  const out = new Map();
  for (const item of items) {
    const key = keyFn(item);
    if (!out.has(key)) {
      out.set(key, []);
    }
    out.get(key).push(item);
  }
  return out;
}
