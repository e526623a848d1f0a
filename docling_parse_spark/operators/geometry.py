"""Geometric utilities over the cell-level table (SURVEY.md §2.E).

The reference exposes per-page geometric predicates on its decoder object
(``intersects_with``, ``get_shape_lines``, ``get_connected_shape_bounding_
boxes`` — page.h:460-691). Our analogs operate on the exploded cells table
(one row per positioned cell) so they compose with any Spark predicate and
scale horizontally:

* ``intersects_with`` — relational EXISTS per (doc_id, page): any visible
  cell overlapping a bbox, excluding invisible render modes 3/7 (the
  reference's exclusion, page.h:460-552).
* ``connected_bbox_components`` — per-page connected components of
  overlapping boxes (iterative merge) as an ``applyInPandas`` kernel; page
  cardinality is O(10³) so per-page quadratic merging is fine, and pages are
  independent (same reasoning as the reference's per-page loop).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

CELLS_DDL = (
    "doc_id string, page int, cell_idx int, text string, "
    "x0 double, y0 double, x1 double, y1 double, "
    "font_key string, font_name string, rendering_mode int, "
    "left_to_right boolean, block_count int, instr_count int"
)


def intersects_with(
    cells: DataFrame, x0: float, y0: float, x1: float, y1: float, tol: float = 0.0
) -> DataFrame:
    """(doc_id, page, intersects) — half-open overlap vs a query bbox,
    excluding invisible text (Tr 3/7)."""
    visible = ~F.col("rendering_mode").isin(3, 7)
    overlap = (
        (F.col("x1") > x0 - tol)
        & (F.col("x0") < x1 + tol)
        & (F.col("y1") > y0 - tol)
        & (F.col("y0") < y1 + tol)
    )
    return cells.groupBy("doc_id", "page").agg(
        F.max(F.when(visible & overlap, 1).otherwise(0)).cast("boolean").alias("intersects")
    )


def merge_overlapping_boxes(
    boxes: list[tuple[float, float, float, float]], tol: float = 0.0
) -> list[tuple[float, float, float, float]]:
    """Pure kernel: iterative merge of overlapping/touching bboxes into
    connected-component envelopes (reference: page.h:640-691)."""
    comps = [list(b) for b in boxes]
    changed = True
    while changed:
        changed = False
        out: list[list[float]] = []
        for b in comps:
            merged = False
            for o in out:
                if (
                    b[2] >= o[0] - tol
                    and b[0] <= o[2] + tol
                    and b[3] >= o[1] - tol
                    and b[1] <= o[3] + tol
                ):
                    o[0] = min(o[0], b[0])
                    o[1] = min(o[1], b[1])
                    o[2] = max(o[2], b[2])
                    o[3] = max(o[3], b[3])
                    merged = True
                    changed = True
                    break
            if not merged:
                out.append(list(b))
        comps = out
    return [tuple(c) for c in comps]


def connected_bbox_components(cells: DataFrame, tol: float = 0.5) -> DataFrame:
    """(doc_id, page, comp_idx, x0, y0, x1, y1) — connected components of the
    page's cell boxes. Per-page kernel via applyInPandas; at corpus scale the
    alternative is GraphFrames connectedComponents (SURVEY.md §2.E) but a
    page is small enough that the local kernel wins by orders of magnitude."""

    def per_page(pdf: pd.DataFrame) -> pd.DataFrame:
        boxes = list(zip(pdf["x0"], pdf["y0"], pdf["x1"], pdf["y1"]))
        # the envelope SET is a fixpoint (input-order independent), but
        # comp_idx assignment is not: applyInPandas row order varies with
        # partition layout/shuffle fetch order, so index components by
        # their sorted envelopes to keep output invariant across
        # partition counts (repo invariant; round-4 review)
        comps = sorted(merge_overlapping_boxes(boxes, tol))
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].iloc[0],
                "page": pdf["page"].iloc[0],
                "comp_idx": range(len(comps)),
                "x0": [c[0] for c in comps],
                "y0": [c[1] for c in comps],
                "x1": [c[2] for c in comps],
                "y1": [c[3] for c in comps],
            }
        )

    return cells.groupBy("doc_id", "page").applyInPandas(
        per_page, schema="doc_id string, page int, comp_idx int, x0 double, y0 double, x1 double, y1 double"
    )


def shape_lines(shapes, horizontal: bool = True, vertical: bool = True, tol: float = 0.5):
    """Pure kernel: visible stroked axis-aligned segments from a page's shape
    items (reference: get_shape_lines, page.h:554-638)."""
    lines = []
    for s in shapes:
        if not s.stroked:
            continue
        pts = s.points
        for (ax, ay), (bx, by) in zip(pts, pts[1:]):
            if horizontal and abs(ay - by) <= tol and abs(ax - bx) > tol:
                lines.append((min(ax, bx), ay, max(ax, bx), by))
            elif vertical and abs(ax - bx) <= tol and abs(ay - by) > tol:
                lines.append((ax, min(ay, by), bx, max(ay, by)))
    return lines
