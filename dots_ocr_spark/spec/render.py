"""A3 — ordered cells → Markdown fold (+ the nohf variant, F3).

Deterministic re-implementation of ``layoutjson2md``
(`/root/reference/dots_ocr/utils/format_transformer.py:141-179`).

Faithfully reproduced quirk: the reference's Picture branch is commented
out, so a Picture cell (no text) falls into the generic branch and
contributes an EMPTY string item to the ``"\\n\\n"`` join.
"""

from __future__ import annotations

from .textnorm import clean_text, formula_in_markdown

PAGE_HF_CATEGORIES = ("Page-header", "Page-footer")


def render_cell_markdown(cell: dict) -> str:
    """Per-category rendering of one cell's text."""
    text = cell.get("text", "")
    if cell.get("category") == "Formula":
        return formula_in_markdown(text)
    return clean_text(text)


def cells_to_markdown(cells: list[dict], no_page_hf: bool = False) -> str:
    """Fold ordered cells into a page Markdown string.

    Ref: format_transformer.py:141-179. ``no_page_hf=True`` drops
    Page-header/Page-footer cells (F3, the ``_nohf.md`` variant).
    """
    items = []
    for cell in cells:
        if no_page_hf and cell.get("category") in PAGE_HF_CATEGORIES:
            continue
        items.append(render_cell_markdown(cell))
    return "\n\n".join(items)
