"""XY-cut layout parsing for PDF payloads (pdfminer-style, from scratch).

Recursive XY-cut over glyph bounding boxes: project glyphs onto each axis,
find the largest whitespace gap exceeding a threshold, split, recurse;
leaves become text blocks read top-to-bottom / left-to-right; within a
block, glyphs cluster into lines by y then sort by x, with spaces
re-inserted at x-gaps.  This is the engine's analogue of the reference's
math-page OCR stage (margin-step reordering demanded at
``gen_ai_calling.py:236`` becomes the XY-cut reading-order policy,
SURVEY.md §2.6).

Deterministic: integer coordinates, integer gap thresholds, explicit
tie-breaks (y before x, lower coordinate first).
"""

from __future__ import annotations

Glyph = tuple[int, int, int, int, str]  # (x, y, w, h, ch)


def _gaps(intervals: list[tuple[int, int]]) -> list[tuple[int, int, int]]:
    """Merged-interval gaps as (gap_size, gap_start, gap_end), sorted by pos."""
    if not intervals:
        return []
    intervals = sorted(intervals)
    out: list[tuple[int, int, int]] = []
    _, cur_end = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_end:
            out.append((s - cur_end, cur_end, s))
        cur_end = max(cur_end, e)
    return out


def _best_gap(glyphs: list[Glyph], axis: int) -> tuple[int, int] | None:
    """Largest projection gap on axis (0=x, 1=y) → (size, cut_pos) or None."""
    if axis == 0:
        iv = [(g[0], g[0] + g[2]) for g in glyphs]
    else:
        iv = [(g[1], g[1] + g[3]) for g in glyphs]
    gaps = _gaps(iv)
    if not gaps:
        return None
    # max by size; ties broken by earliest position (deterministic)
    size, start, end = max(gaps, key=lambda t: (t[0], -t[1]))
    return size, (start + end) // 2


def xy_cut_blocks(
    glyphs: list[Glyph],
    min_gap_x: int = 24,
    min_gap_y: int = 18,
) -> list[list[Glyph]]:
    """Recursively split glyphs into layout blocks in reading order."""
    if not glyphs:
        return []

    def rec(gs: list[Glyph]) -> list[list[Glyph]]:
        gx = _best_gap(gs, 0)
        gy = _best_gap(gs, 1)
        cand: list[tuple[int, int, int]] = []  # (size, axis, pos)
        if gy and gy[0] >= min_gap_y:
            cand.append((gy[0], 1, gy[1]))
        if gx and gx[0] >= min_gap_x:
            cand.append((gx[0], 0, gx[1]))
        if not cand:
            return [gs]
        # cut along the larger gap; ties prefer the horizontal cut (axis=1,
        # i.e. a y-gap splitting top/bottom) for stable reading order
        size, axis, pos = max(cand, key=lambda t: (t[0], t[1]))
        left = [g for g in gs if g[axis] + (g[2] if axis == 0 else g[3]) <= pos]
        right = [g for g in gs if g[axis] + (g[2] if axis == 0 else g[3]) > pos]
        if not left or not right:
            return [gs]
        return rec(left) + rec(right)

    return rec(sorted(glyphs, key=lambda g: (g[1], g[0])))


def block_to_text(block: list[Glyph], space_factor: int = 2, line_slack: int = 2) -> str:
    """Cluster a block's glyphs into lines (y), order by x, re-insert spaces.

    A space is emitted when the x-gap between consecutive glyphs exceeds
    half the glyph width × ``space_factor`` … kept integer: gap > w//2.
    """
    if not block:
        return ""
    gs = sorted(block, key=lambda g: (g[1], g[0]))
    lines: list[list[Glyph]] = []
    cur: list[Glyph] = [gs[0]]
    for g in gs[1:]:
        if g[1] - cur[-1][1] > line_slack:
            lines.append(cur)
            cur = [g]
        else:
            cur.append(g)
    lines.append(cur)

    out_lines: list[str] = []
    for line in lines:
        line.sort(key=lambda g: g[0])
        buf: list[str] = []
        prev_end: int | None = None
        for x, _y, w, _h, ch in line:
            if prev_end is not None and x - prev_end > w // 2:
                buf.append(" ")
            buf.append(ch)
            prev_end = x + w
        out_lines.append("".join(buf))
    return "\n".join(out_lines)


def parse_pdf_layout(glyphs: list[Glyph]) -> tuple[str, int]:
    """Full parse: XY-cut → per-block line assembly → reading-order join.

    Returns ``(text, n_blocks)``; blocks joined by blank lines.
    """
    blocks = xy_cut_blocks(glyphs)
    texts = [block_to_text(b) for b in blocks]
    texts = [t for t in texts if t]
    return "\n\n".join(texts), len(texts)
