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

    Page-level form of :func:`clip_text`: the word layer is sorted by
    (block, line, word) ONCE per page; selecting from the pre-sorted
    list preserves order, so the per-cell sort disappears. (A numpy
    mask variant was measured SLOWER at typical page sizes — ~200 words
    — where array construction overhead exceeds the loop saved.)"""
    sw = sorted(words, key=lambda w: (w[5], w[6], w[7]))
    for c in cells:
        if c.get("category") in SKIP_CLIP_CATEGORIES:
            continue
        x1, y1, x2, y2 = [v / scale_factor for v in c["bbox"]]
        c["text"] = _assemble([
            w for w in sw
            if w[0] >= x1 and w[1] >= y1 and w[2] <= x2 and w[3] <= y2
        ])
