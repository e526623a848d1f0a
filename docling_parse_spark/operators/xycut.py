"""XY-cut reading-order reconstruction.

The reference has NO layout reading order — its order is content-stream order
(verified in SURVEY.md §1.1). The north star adds XY-cut on top: the classic
recursive page-segmentation algorithm (Nagy & Seth 1984): split the page at
the widest empty horizontal gap (top-to-bottom), else the widest empty
vertical gap (left-to-right), recurse; leaves are emitted in visit order.

``xy_cut_order`` is a pure kernel over one page's boxes (runs inside the
decode UDF when ``DecodeConfig.reading_order='xycut'``); ``reorder_spans``
is unnecessary at corpus level — order is per-page, embarrassingly parallel.
"""

from __future__ import annotations

MIN_GAP = 2.0  # points; smaller gaps are noise, don't split


def xy_cut_order(boxes: list[tuple[float, float, float, float]], min_gap: float = MIN_GAP) -> list[int]:
    """Return the indices of ``boxes`` (x0, y0, x1, y1; y up) in XY-cut
    reading order: recursive horizontal-then-vertical gap splitting, leaves
    read top-to-bottom then left-to-right, ties by original index."""
    n = len(boxes)
    if n == 0:
        return []
    order: list[int] = []

    def best_gap(idxs, axis):
        lo_i, hi_i = (1, 3) if axis == "y" else (0, 2)
        intervals = sorted((boxes[i][lo_i], boxes[i][hi_i]) for i in idxs)
        best = None
        cur_hi = intervals[0][1]
        for lo, hi in intervals[1:]:
            if lo > cur_hi + min_gap:
                gap = lo - cur_hi
                if best is None or gap > best[0]:
                    best = (gap, (cur_hi + lo) / 2.0)
            cur_hi = max(cur_hi, hi)
        return best  # (width, cut) or None

    # explicit work stack (not recursion): a page with thousands of
    # gap-separated cells must not hit Python's recursion limit
    stack: list[list[int]] = [list(range(n))]
    while stack:
        idxs = stack.pop()
        if len(idxs) <= 1:
            order.extend(idxs)
            continue
        # widest-gap-wins across both axes: a full-height column gutter beats
        # inter-line gaps, so multi-column layouts split into columns first
        gy = best_gap(idxs, "y")
        gx = best_gap(idxs, "x")
        if gy is not None and (gx is None or gy[0] >= gx[0]):
            cut = gy[1]
            top = [i for i in idxs if (boxes[i][1] + boxes[i][3]) / 2 >= cut]
            bottom = [i for i in idxs if (boxes[i][1] + boxes[i][3]) / 2 < cut]
            if top and bottom:
                stack.append(bottom)  # LIFO: top is processed first
                stack.append(top)
                continue
        if gx is not None:
            cut = gx[1]
            left = [i for i in idxs if (boxes[i][0] + boxes[i][2]) / 2 < cut]
            right = [i for i in idxs if (boxes[i][0] + boxes[i][2]) / 2 >= cut]
            if left and right:
                stack.append(right)
                stack.append(left)
                continue
        # no split possible: emit top-to-bottom, left-to-right, stable
        order.extend(
            sorted(idxs, key=lambda i: (-round(boxes[i][3], 3), round(boxes[i][0], 3), i))
        )
    return order
