"""Static HTML session report — a dependency-free alternative to the
Streamlit dashboard (visualization/dashboard_app.py): one self-contained
HTML file with KPIs, phase status/timings, the zone-count chart and image
galleries, embedded as base64 so the file travels anywhere.

Usage:
  python tools/report_html.py --session output/<session_id> [--output report.html]
"""

from __future__ import annotations

import argparse
import base64
import html
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from office_person_detection_vit_tpu.visualization.dashboard_utils import (  # noqa: E402
    SessionDataLoader,
)

_STYLE = """
body { font-family: -apple-system, 'Segoe UI', sans-serif; margin: 2rem auto;
       max-width: 1100px; color: #1a1a2e; }
h1 { border-bottom: 2px solid #4361ee; padding-bottom: .3rem; }
.kpis { display: flex; gap: 1rem; flex-wrap: wrap; margin: 1rem 0; }
.kpi { background: #f1f3f8; border-radius: 8px; padding: .8rem 1.4rem; }
.kpi b { display: block; font-size: 1.6rem; color: #4361ee; }
table { border-collapse: collapse; margin: 1rem 0; }
td, th { border: 1px solid #d8dce6; padding: .35rem .7rem; text-align: left; }
th { background: #f1f3f8; }
.gallery { display: flex; gap: .6rem; flex-wrap: wrap; }
.gallery img { max-width: 320px; border-radius: 6px; border: 1px solid #d8dce6; }
.ok { color: #2a9d8f; } .fail { color: #e63946; } .skip { color: #999; }
"""


MAX_EMBED_BYTES = 2_000_000  # per image; oversized files are listed, not embedded


def _img_tag(path: Path) -> str:
    if path.stat().st_size > MAX_EMBED_BYTES:
        return (f"<div class='kpi'>{html.escape(path.name)} "
                f"({path.stat().st_size // 1024} KB — too large to embed)</div>")
    data = base64.b64encode(path.read_bytes()).decode()
    mime = "image/png" if path.suffix == ".png" else "image/jpeg"
    return f'<img src="data:{mime};base64,{data}" title="{html.escape(path.name)}">'


def render(session_dir: Path, max_gallery: int = 8) -> str:
    loader = SessionDataLoader(session_dir)
    meta = loader.metadata() or {}
    summary = loader.summary() or {}
    stats = summary.get("statistics", {})
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>Session {html.escape(session_dir.name)}</title>",
        f"<style>{_STYLE}</style></head><body>",
        f"<h1>Session {html.escape(session_dir.name)}</h1>",
        f"<p>status: <b>{html.escape(str(summary.get('status', '?')))}</b>"
        f" · created {html.escape(str(meta.get('timestamp', '?')))}</p>",
    ]

    # ------------------------------------------------------------------ KPIs
    parts.append("<div class='kpis'>")
    for label, key in (
        ("Frames", "frames_extracted"),
        ("Detections", "total_detections"),
        ("Avg/frame", "avg_detections_per_frame"),
        ("Zones", "zones_count"),
    ):
        v = stats.get(key, "—")
        if isinstance(v, float):
            v = f"{v:.2f}"
        parts.append(f"<div class='kpi'><b>{v}</b>{label}</div>")
    parts.append("</div>")

    # ---------------------------------------------------------- phase table
    status = loader.phase_status()
    perf = summary.get("performance", {})
    if status or perf:
        parts.append("<h2>Phases</h2><table><tr><th>phase</th><th>status</th>"
                     "<th>time (s)</th></tr>")
        for phase in sorted(set(status) | set(perf)):
            st = status.get(phase, "—")
            cls = {"completed": "ok", "failed": "fail", "skipped": "skip"}.get(st, "")
            t = perf.get(phase, {}).get("total_time", "—")
            parts.append(
                f"<tr><td>{html.escape(phase)}</td>"
                f"<td class='{cls}'>{html.escape(str(st))}</td><td>{t}</td></tr>"
            )
        parts.append("</table>")

    # ------------------------------------------------------------ zone chart
    zones, rows = loader.zone_counts()
    if rows:
        parts.append("<h2>Zone occupancy</h2>")
        width, height, pad = 1000, 260, 40
        maxv = max(
            (int(float(r[z])) for r in rows for z in zones if r.get(z)), default=1
        ) or 1
        n = len(rows)
        colors = ["#4361ee", "#e63946", "#2a9d8f", "#f4a261", "#9d4edd", "#577590"]
        svg = [f"<svg width='{width}' height='{height}' "
               f"style='background:#fbfbfe;border:1px solid #d8dce6'>"]
        for zi, z in enumerate(zones):
            pts = []
            for i, r in enumerate(rows):
                x = pad + (width - 2 * pad) * (i / max(n - 1, 1))
                y = height - pad - (height - 2 * pad) * (
                    int(float(r.get(z) or 0)) / maxv
                )
                pts.append(f"{x:.1f},{y:.1f}")
            color = colors[zi % len(colors)]
            svg.append(
                f"<polyline points='{' '.join(pts)}' fill='none' "
                f"stroke='{color}' stroke-width='2'/>"
            )
            svg.append(
                f"<text x='{pad + zi * 130}' y='18' fill='{color}'"
                f" font-size='13'>{html.escape(z)}</text>"
            )
        svg.append(f"<text x='4' y='{pad}' font-size='11'>{maxv}</text>")
        svg.append(f"<text x='4' y='{height - pad}' font-size='11'>0</text>")
        svg.append("</svg>")
        parts.append("".join(svg))

    # ------------------------------------------------------------- galleries
    for title, phase in (
        ("Detections", "02_detection"),
        ("Floormaps", "06_visualization"),
    ):
        images = loader.images(phase, limit=max_gallery)
        if images:
            parts.append(f"<h2>{title}</h2><div class='gallery'>")
            parts.extend(_img_tag(p) for p in images)
            parts.append("</div>")

    parts.append("</body></html>")
    return "".join(parts)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="static HTML session report")
    parser.add_argument("--session", required=True, type=Path)
    parser.add_argument("--output", type=Path, default=None)
    args = parser.parse_args(argv)
    out = args.output or (args.session / "report.html")
    out.write_text(render(args.session), encoding="utf-8")
    print(f"report -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
