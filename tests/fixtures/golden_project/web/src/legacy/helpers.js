/**
 * Legacy CommonJS helpers kept for the build scripts (require/module.exports
 * mix — the module systems the indexer must both understand).
 */

const { statusEmoji } = require("../utils/format");

function slugify(text) {
  return String(text)
    .toLowerCase()
    .replace(/[^a-z0-9]+/g, "-")
    .replace(/^-+|-+$/g, "")
    .slice(0, 48);
}

function parseQuery(search) {
  const out = {};
  const raw = (search || "").replace(/^\?/, "");
  if (!raw) {
    return out;
  }
  for (const pair of raw.split("&")) {
    const [key, value] = pair.split("=");
    out[decodeURIComponent(key)] = decodeURIComponent(value || "");
  }
  return out;
}

function legendLine(statuses) {
  return statuses
    .map(function (status) {
      return statusEmoji(status) + " " + status;
    })
    .join("  ");
}

var RETRY_DELAYS = [100, 400, 1600];

function retryDelay(attempt) {
  if (attempt < 0 || attempt >= RETRY_DELAYS.length) {
    return RETRY_DELAYS[RETRY_DELAYS.length - 1];
  }
  return RETRY_DELAYS[attempt];
}

module.exports = {
  slugify: slugify,
  parseQuery: parseQuery,
  legendLine: legendLine,
  retryDelay: retryDelay,
};
