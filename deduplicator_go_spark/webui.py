"""Static single-file web UI for the HTTP search service.

Reference parity (/root/reference/web/ — a Vite+React app,
web/src/App.jsx:1-218): a debounced partial-filepath search box over
GET /api/search, a health banner from GET /api/health (host scope +
read-only mode), a results table (path / root / size / hash) with
per-row delete behind a confirm dialog (POST /api/files/<id>/delete),
and human byte formatting.

Re-expressed as one dependency-free HTML page served by server.py at
``/`` — no node/npm toolchain exists in this environment, and a
zero-build page keeps the serving surface a single Python process,
matching how the engine is deployed. Behavior parity, not a port: the
markup, styling and script are original.
"""

from __future__ import annotations

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8"/>
<meta name="viewport" content="width=device-width, initial-scale=1"/>
<title>Deduplicator</title>
<style>
  :root { color-scheme: light dark; font-family: system-ui, sans-serif; }
  body { margin: 0; background: #f5f6f8; color: #1c2430; }
  @media (prefers-color-scheme: dark) { body { background: #14181f; color: #e6e9ee; } }
  .shell { max-width: 1060px; margin: 0 auto; padding: 20px; }
  .topbar { display: flex; flex-wrap: wrap; gap: 12px; align-items: center;
            justify-content: space-between; margin-bottom: 14px; }
  h1 { font-size: 20px; margin: 0; }
  .subline { font-size: 12.5px; opacity: .7; margin-top: 3px; }
  .searchbox { display: flex; align-items: center; gap: 8px; padding: 8px 12px;
               border: 1px solid #8884; border-radius: 8px; min-width: 300px;
               background: #fff2; }
  .searchbox input { border: 0; outline: 0; background: transparent; flex: 1;
                     font-size: 14px; color: inherit; }
  .msg { padding: 8px 12px; border-radius: 6px; margin: 8px 0; font-size: 13px; }
  .msg.error { background: #c0392b22; border: 1px solid #c0392b66; }
  .msg.success { background: #27ae6022; border: 1px solid #27ae6066; }
  .msg.warning { background: #f39c1222; border: 1px solid #f39c1266; }
  table { width: 100%; border-collapse: collapse; font-size: 13.5px;
          background: #fff1; border: 1px solid #8883; border-radius: 8px; }
  th, td { text-align: left; padding: 8px 10px; border-bottom: 1px solid #8882; }
  th { font-size: 12px; text-transform: uppercase; letter-spacing: .04em; opacity: .65; }
  td .path { font-weight: 600; word-break: break-all; }
  td .full { font-size: 11.5px; opacity: .6; word-break: break-all; }
  .hash { font-family: ui-monospace, monospace; font-size: 11.5px; opacity: .8;
          word-break: break-all; }
  .empty { text-align: center; opacity: .55; padding: 24px 0; }
  button { font: inherit; cursor: pointer; border-radius: 6px; padding: 6px 10px;
           border: 1px solid #8886; background: transparent; color: inherit; }
  button[disabled] { opacity: .45; cursor: not-allowed; }
  button.danger { color: #c0392b; border-color: #c0392b88; }
  button.danger.solid { background: #c0392b; color: #fff; }
  .backdrop { position: fixed; inset: 0; background: #0008; display: flex;
              align-items: center; justify-content: center; }
  .modal { background: #fff; color: #1c2430; border-radius: 10px; padding: 18px;
           max-width: 480px; width: calc(100% - 40px); }
  @media (prefers-color-scheme: dark) { .modal { background: #1d232d; color: #e6e9ee; } }
  .modal .path { font-family: ui-monospace, monospace; font-size: 12.5px;
                 margin: 10px 0 16px; word-break: break-all; }
  .modal .actions { display: flex; gap: 10px; justify-content: flex-end; }
  .spin { display: inline-block; animation: spin 1s linear infinite; }
  @keyframes spin { to { transform: rotate(360deg); } }
</style>
</head>
<body>
<div class="shell">
  <div class="topbar">
    <div>
      <h1>Deduplicator Files</h1>
      <div class="subline" id="subline">0 results · 0 B</div>
    </div>
    <label class="searchbox">&#128269;
      <input id="q" placeholder="Partial filepath" autofocus autocomplete="off"/>
      <span id="spinner" class="spin" hidden>&#8987;</span>
    </label>
  </div>
  <div id="msg"></div>
  <table aria-label="Search results">
    <thead><tr><th>Path</th><th>Root</th><th>Size</th><th>Hash</th><th>Action</th></tr></thead>
    <tbody id="rows"><tr><td colspan="5" class="empty">Enter a filepath fragment</td></tr></tbody>
  </table>
</div>
<div id="modal-slot"></div>
<script>
"use strict";
const LIMIT = 100;
let health = null, results = [], controller = null, timer = null;

const $ = (id) => document.getElementById(id);
const esc = (s) => String(s ?? "").replace(/[&<>"']/g,
  (c) => ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;","'":"&#39;"}[c]));

function formatBytes(v) {
  if (!v) return "0 B";
  const units = ["B","KB","MB","GB","TB","PB"];
  let size = v, u = 0;
  while (size >= 1024 && u < units.length - 1) { size /= 1024; u += 1; }
  return size.toFixed(size >= 10 || u === 0 ? 0 : 1) + " " + units[u];
}

function setMsg(kind, text) {
  $("msg").innerHTML = text ? '<div class="msg ' + kind + '">' + esc(text) + "</div>" : "";
}

function render() {
  const total = results.reduce((s, f) => s + (f.size || 0), 0);
  const scope = health ? (health.allHosts ? " · all hosts" : " · " + esc(health.hostname)) : "";
  const ro = health && !health.deleteEnabled ? " · read-only" : "";
  $("subline").textContent = results.length + " results · " + formatBytes(total);
  $("subline").innerHTML += scope + ro;
  const rows = $("rows");
  if (!results.length) {
    const q = $("q").value.trim();
    rows.innerHTML = '<tr><td colspan="5" class="empty">' +
      (q ? "No matches" : "Enter a filepath fragment") + "</td></tr>";
    return;
  }
  rows.innerHTML = results.map((f, i) =>
    "<tr><td><div class=path>" + esc(f.path) + "</div>" +
    (f.fullPath ? "<div class=full>" + esc(f.fullPath) + "</div>" : "") + "</td>" +
    "<td>" + esc(f.rootFolder ?? f.host ?? "") + "</td>" +
    "<td>" + formatBytes(f.size) + "</td>" +
    "<td><span class=hash>" + esc(f.hash ?? "null") + "</span></td>" +
    "<td><button class=danger data-i=" + i +
    ((health && !health.deleteEnabled) ? " disabled" : "") +
    ">Delete</button></td></tr>").join("");
  for (const b of rows.querySelectorAll("button[data-i]"))
    b.onclick = () => openModal(results[+b.dataset.i]);
}

function openModal(file) {
  $("modal-slot").innerHTML =
    '<div class="backdrop"><div class="modal" role="dialog" aria-modal="true">' +
    "<h2>Confirm deletion</h2><div class=path>" + esc(file.fullPath || file.path) +
    '</div><div class=actions><button id=m-cancel>Cancel</button>' +
    '<button id=m-del class="danger solid">Delete</button></div></div></div>';
  $("m-cancel").onclick = closeModal;
  $("m-del").onclick = async () => {
    $("m-del").disabled = true;
    setMsg("", "");
    try {
      const r = await fetch("/api/files/" + file.id + "/delete", {method: "POST"});
      const p = await r.json();
      if (!r.ok) throw new Error(p.error || "Delete failed");
      results = results.filter((f) => f.id !== file.id);
      setMsg("success", p.alreadyMissing
        ? "Database row removed; file was already missing."
        : "File and database row removed.");
      closeModal(); render();
    } catch (e) { setMsg("error", e.message); $("m-del").disabled = false; }
  };
}
function closeModal() { $("modal-slot").innerHTML = ""; }

async function runSearch(q) {
  if (controller) controller.abort();
  controller = new AbortController();
  $("spinner").hidden = false;
  setMsg("", "");
  try {
    const r = await fetch("/api/search?q=" + encodeURIComponent(q) + "&limit=" + LIMIT,
                          {signal: controller.signal});
    const p = await r.json();
    if (!r.ok) throw new Error(p.error || "Search failed");
    results = p; render();
  } catch (e) {
    if (e.name !== "AbortError") { results = []; render(); setMsg("error", e.message); }
  } finally { $("spinner").hidden = true; }
}

$("q").addEventListener("input", () => {
  clearTimeout(timer);
  const q = $("q").value.trim();
  if (!q) { results = []; render(); setMsg("", ""); return; }
  timer = setTimeout(() => runSearch(q), 250);
});

fetch("/api/health").then((r) => r.ok ? r.json() : null).then((h) => {
  health = h;
  if (h && !h.deleteEnabled && h.deleteDisabledReason)
    setMsg("warning", h.deleteDisabledReason);
  render();
}).catch(() => {});
render();
</script>
</body>
</html>
"""
