"""Report sinks: CSV export (S9) and the HTML profile report (S10).

Reference: ``data_profiler.py:604-644`` (/root/reference) exports the
describe() sheet to xlsx — skipping the raw-data sheet when rows × cols ≥
100,000 — and renders per-column summary + plotly histogram/box-plot
fragments into one ``distribution charts.html``. Re-expressed for a lake
engine:

- :func:`export_csv` — the DATA path. Distributed ``df.write.csv`` (each
  task writes its partition; no driver bottleneck at any scale), with an
  opt-in ``single_file`` mode for report-sized frames where one artifact
  file is worth the coalesce(1).
- :func:`render_html_report` — the REPORT path. Driver-side, stdlib-only:
  report frames (profiles, verdict grids, histograms, drift scores) are
  metadata-sized BY CONSTRUCTION (O(columns × metrics), O(checks ×
  partitions), O(bins)), so collecting them is the correct plan at any data
  scale — the same reasoning as the verdict-grid assembly in
  plans/runner.py. Histogram sections render as inline SVG bars (no plotly
  / no CDN in the sandbox; the reference's plotly fragments are the
  single-node analog). A cell-count guard mirrors the reference's 100k
  raw-sheet skip.
"""

from __future__ import annotations

import html
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame

# Reference guard: skip embedding a frame when rows*cols >= this
# (data_profiler.py:613-615).
RAW_SHEET_CELL_LIMIT = 100_000


def export_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    header: bool = True,
    mode: str = "overwrite",
) -> None:
    """CSV export sink (S9; reference: pandas ``to_excel``/``to_csv`` in
    ``data_profiler.py:612-616``). Distributed by default — ``single_file``
    only for bounded report frames (it funnels through one task)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.6g}"
    return "" if v is None else str(v)


def _table_html(cols: Sequence[str], rows: Sequence[Sequence]) -> str:
    head = "".join(f"<th>{html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(_fmt(v))}</td>" for v in r) + "</tr>"
        for r in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def _bars_svg(labels: Sequence, counts: Sequence[float], width: int = 640, height: int = 160) -> str:
    """Inline-SVG histogram — the sandbox stand-in for the reference's
    plotly ``to_html`` fragments (data_profiler.py:637-641)."""
    n = max(len(counts), 1)
    peak = max([c for c in counts if c is not None] + [1])
    bw = width / n
    bars = []
    for i, c in enumerate(counts):
        h = 0 if not c else (c / peak) * (height - 20)
        bars.append(
            f'<rect x="{i * bw + 1:.1f}" y="{height - h:.1f}" '
            f'width="{max(bw - 2, 1):.1f}" height="{h:.1f}">'
            f"<title>{html.escape(_fmt(labels[i]))}: {_fmt(c)}</title></rect>"
        )
    return (
        f'<svg viewBox="0 0 {width} {height}" width="{width}" height="{height}" '
        f'class="hist">{"".join(bars)}</svg>'
    )


def render_html_report(
    sections: list[tuple[str, DataFrame]],
    path: str,
    title: str = "data profile",
    subtitle: str = "",
    cell_limit: int = RAW_SHEET_CELL_LIMIT,
) -> str:
    """Render bounded report frames to ONE self-contained HTML file.

    ``sections``: (heading, DataFrame) pairs. A frame whose collected size
    would exceed ``cell_limit`` cells is replaced by a skip notice (the
    reference's raw-sheet guard) — callers pass report frames, and the guard
    keeps a mistakenly-passed fact table from flattening the driver: the
    count() runs distributed BEFORE any collect. A section whose columns
    look like a histogram (bucket/count or similar label+numeric pair) gets
    an inline SVG chart above its table. Returns ``path``.
    """
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'/>",
        f"<title>{html.escape(title)}</title>",
        "<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}"
        "td,th{border:1px solid #999;padding:2px 8px;font-size:13px}"
        "th{background:#eee}svg.hist rect{fill:#4878a8}</style></head><body>",
        f"<h1>{html.escape(title)}</h1>",
    ]
    if subtitle:
        parts.append(f"<p>{html.escape(subtitle)}</p>")
    for heading, df in sections:
        parts.append(f"<h2>{html.escape(heading)}</h2>")
        cols = df.columns
        # ONE action: limit to just past the cell budget and apply the guard
        # to what actually came back. The previous count()-then-collect()
        # recomputed the frame twice and could collect more rows than
        # counted on a nondeterministic input.
        row_limit = cell_limit // max(len(cols), 1)
        rows = df.limit(row_limit + 1).collect()
        if len(rows) > row_limit:
            parts.append(
                f"<p><em>skipped: over {row_limit} rows × {len(cols)} cols "
                f"exceeds the {cell_limit}-cell report guard</em></p>"
            )
            continue
        if len(cols) == 2 and rows and isinstance(rows[0][1], (int, float)):
            parts.append(_bars_svg([r[0] for r in rows], [r[1] for r in rows]))
        parts.append(_table_html(cols, [list(r) for r in rows]))
    parts.append("</body></html>")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(parts))
    return path
