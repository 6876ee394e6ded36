"""TOC ↔ header fuzzy match + directory level reassignment (J1, O5, T9, F8).

Deterministic re-implementation of
`/root/reference/dots_ocr/utils/directory_entry.py:100-122` (distance) and
`:180-215` (``rebuild_directory_by_toc``), with the rapidfuzz dependency
replaced by a pure-Python Indel ratio (``fuzz.ratio`` is the normalized
Indel similarity — 200·LCS/(|a|+|b|) — which this reproduces exactly for
the ASCII header strings in scope).

TOC entries are dicts ``{"level": int, "text": str, "to": [x, y]}`` in
top-left-origin page coordinates (pdf_extractor.py:94-122; the y-flip
happens at extraction time and is the ingestor's job).
"""

from __future__ import annotations

import re

from . import headers as H

FUZZ_GATE = 40.0  # F8 — ratio below this ⇒ no match (directory_entry.py:107)

_PREFIX_NUM_RE = re.compile(r"^[\d\.\s]+")


def remove_prefix_number(text: str) -> str:
    """T9 — strip leading digits/dots/spaces, then surrounding `` .\\t\\n``.

    Ref: directory_entry.py:102-105.
    """
    cleaned = _PREFIX_NUM_RE.sub("", text)
    return cleaned.strip(" .\t\n")


def indel_ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.ratio`` equivalent: 100·(1 − indel/(|a|+|b|)) with
    indel = |a|+|b| − 2·LCS(a, b).

    LCS via the Allison–Dix bit-parallel recurrence (O(|a|·|b|/w) on
    Python big ints) — exact, ~20× the rolling-row DP on header-length
    strings."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    if la == 0 or lb == 0:
        return 0.0
    masks: dict[str, int] = {}
    bit = 1
    for cb in b:
        masks[cb] = masks.get(cb, 0) | bit
        bit <<= 1
    row = 0
    for ca in a:
        x = row | masks.get(ca, 0)
        row = x & ~(x - ((row << 1) | 1))
    lcs = row.bit_count()
    return 100.0 * (2.0 * lcs) / (la + lb)


def header_toc_distance(header: dict, entry: dict) -> float:
    """J1 distance — point-to-bbox Euclidean distance, gated by the fuzzy
    text ratio (< 40 ⇒ +inf).

    Ref: directory_entry.py:100-122 (``calc_dist``): the header text is
    prefix-number-stripped before matching; a point inside the bbox has
    distance 0.
    """
    ratio = indel_ratio(remove_prefix_number(header["clean_text"]), entry["text"])
    if ratio < FUZZ_GATE:
        return float("inf")
    x, y = entry["to"][0], entry["to"][1]
    x1, y1, x2, y2 = header["bbox"]
    if x1 <= x <= x2 and y1 <= y <= y2:
        return 0.0
    dx = max(x1 - x, 0, x - x2)
    dy = max(y1 - y, 0, y - y2)
    return (dx ** 2 + dy ** 2) ** 0.5


def rebuild_directory_by_toc(headers: list[dict], toc: list[dict]) -> None:
    """J1 + O5 — assign ``new_level`` to every header from the TOC, then
    rewrite texts/categories in place.

    Ref: directory_entry.py:180-215. Semantics preserved exactly:

    - each TOC entry claims its nearest header (ties: first header wins,
      strict ``<``); later entries may overwrite an earlier claim;
    - ``max_level`` = max matched level, floored at 5;
    - unmatched List-item headers → level 8; other unmatched headers →
      ``min(8, max_level + rank(level among unmatched levels) + 1)``;
    - every header is then rewritten via T8.
    """
    max_level = 0
    for entry in toc:
        min_g_dist = float("inf")
        closest = None
        for header in headers:
            g_dist = header_toc_distance(header, entry)
            if g_dist < min_g_dist:
                min_g_dist = g_dist
                closest = header
        if closest is not None:
            closest["new_level"] = entry["level"]
            max_level = max(max_level, closest["new_level"])

    max_level = max(5, max_level)
    level_set = sorted({h["level"] for h in headers if h["new_level"] is None})
    for header in headers:
        if header["new_level"] is None:
            if header["category"] == "List-item":
                header["new_level"] = 8
            else:
                header["new_level"] = min(
                    8, max_level + level_set.index(header["level"]) + 1
                )


def apply_toc_rebuild(cells: list[dict], toc: list[dict],
                      categories=None) -> list[dict]:
    """Full J1/O5 pass over a page's cells: build header records for the
    header categories, rebuild levels from the TOC, and write the rewritten
    text/category back into (copies of) the matching cells.

    Ref composition: directory_entry.py:130-153 (``load_from_json``) +
    :180-215 + the per-header ``reset_text_and_update`` write-back.
    Returns a new cell list; non-header cells are shared untouched.

    ``toc=None`` (document has no TOC) skips the rebuild entirely;
    ``toc=[]`` (structured document, page without TOC entries) still runs
    it, demoting every header through the unmatched-reassignment path —
    faithfully matching dots_ocr/parser.py:210-213 + ocr_task.py:571-577.
    """
    if toc is None:
        return cells
    cats = categories if categories is not None else H.DEFAULT_HEADER_CATEGORIES
    header_records = [
        H.make_header(cell, i)
        for i, cell in enumerate(cells)
        if cell.get("category") in cats
    ]
    if not header_records:
        return cells
    rebuild_directory_by_toc(header_records, toc)
    out = list(cells)
    for header in header_records:
        rewritten = H.rewrite_header(header)
        if rewritten is None:
            continue
        new_text, new_category = rewritten
        cell = dict(out[header["cell_idx"]])
        cell["text"] = new_text
        cell["category"] = new_category
        out[header["cell_idx"]] = cell
    return out
