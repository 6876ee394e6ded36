"""J3 — word-grain bbox-clip text extraction.

Deterministic re-implementation of the reference's PDF text-layer clip:
``pdf_extractor.extract_text(page, bbox)`` runs
``page.get_text("text", clip=rect)`` then collapses single newlines
(`/root/reference/dots_ocr/utils/pdf_extractor.py:45-62`), and the
pipeline path fills every non-Table/Picture/Formula detected block's text
from it (`/root/reference/app/utils/executor/ocr_task.py:558-568`,
dividing the image-space bbox by the rasterization scale first).

Here the PDF text layer is an explicit **word-box list** in PDF space —
the ``page.get_text("words")`` shape
``[x0, y0, x1, y1, word, block_no, line_no, word_no]`` — because the
container ships no fitz; a rectangle-containment selection over that list
reproduces the clip semantics at word grain.
"""

from __future__ import annotations

from .textnorm import collapse_single_newlines

#: categories whose text is NOT taken from the PDF layer
#: (ocr_task.py:562 — Table/Picture/Formula keep their payload content)
SKIP_CLIP_CATEGORIES = ("Table", "Picture", "Formula")


def normalize_words(words: list) -> list:
    """Accept either the positional fitz shape
    ``[x0, y0, x1, y1, word, block_no, line_no, word_no]`` or JSON-object
    entries with those field names (what ``to_json`` of a struct column
    produces) and return the positional form."""
    if words and isinstance(words[0], dict):
        return [
            [w["x0"], w["y0"], w["x1"], w["y1"],
             w["word"], w["block_no"], w["line_no"], w["word_no"]]
            for w in words
        ]
    return words


def _assemble(sel: list) -> str:
    """Fold (block,line,word)-sorted words into text the way fitz "text"
    output reads: words of a (block, line) join with spaces, lines join
    with ``\\n``; then T10 collapses the single newlines and strips
    (pdf_extractor.py:55-56)."""
    lines: list[list[str]] = []
    cur_key = None
    for w in sel:
        key = (w[5], w[6])
        if key != cur_key:
            lines.append([])
            cur_key = key
        lines[-1].append(w[4])
    raw = "\n".join(" ".join(line) for line in lines)
    return collapse_single_newlines(raw)


def clip_text(words: list, bbox: list) -> str:
    """Text of all words whose rectangle lies inside ``bbox``.

    Selection = full rectangle containment (the word-grain analog of
    fitz's clip, which keeps characters lying within the clip area).
    """
    words = normalize_words(words)
    x1, y1, x2, y2 = bbox
    sel = [
        w for w in words
        if w[0] >= x1 and w[1] >= y1 and w[2] <= x2 and w[3] <= y2
    ]
    sel.sort(key=lambda w: (w[5], w[6], w[7]))
    return _assemble(sel)


def fill_cell_texts(cells: list[dict], words: list,
                    scale_factor: float) -> None:
    """In-place: set every non-skip cell's text from the word layer,
    clipping at ``bbox / scale_factor`` (words live in PDF space, cells in
    image space — ocr_task.py:565).

    Page-level form of :func:`clip_text` with coarse-to-fine spatial
    pruning: the word layer is sorted by (block, line, word) ONCE per
    page and grouped into its text blocks with their bounding boxes; a
    cell then tests ~10 block boxes instead of every word — disjoint
    blocks are skipped, fully-contained blocks are taken whole, and only
    boundary-straddling blocks scan word-by-word. Exact: a contained
    word's block box necessarily intersects the cell, so pruning can
    never drop a selected word, and block/word order is preserved.
    (A numpy mask variant was measured slower at typical ~200-word
    pages, where array construction overhead exceeds the loop saved.)"""
    sw = sorted(normalize_words(words), key=lambda w: (w[5], w[6], w[7]))
    blocks: list[list] = []  # [bx1, by1, bx2, by2, block_no, [words]]
    for w in sw:
        if not blocks or blocks[-1][4] != w[5]:
            blocks.append([w[0], w[1], w[2], w[3], w[5], [w]])
        else:
            b = blocks[-1]
            if w[0] < b[0]:
                b[0] = w[0]
            if w[1] < b[1]:
                b[1] = w[1]
            if w[2] > b[2]:
                b[2] = w[2]
            if w[3] > b[3]:
                b[3] = w[3]
            b[5].append(w)
    for c in cells:
        if c.get("category") in SKIP_CLIP_CATEGORIES:
            continue
        x1, y1, x2, y2 = [v / scale_factor for v in c["bbox"]]
        sel: list = []
        for bx1, by1, bx2, by2, _, ws in blocks:
            if bx1 > x2 or bx2 < x1 or by1 > y2 or by2 < y1:
                continue
            if bx1 >= x1 and by1 >= y1 and bx2 <= x2 and by2 <= y2:
                sel.extend(ws)
            else:
                sel.extend(
                    w for w in ws
                    if w[0] >= x1 and w[1] >= y1 and w[2] <= x2 and w[3] <= y2
                )
        c["text"] = _assemble(sel)
