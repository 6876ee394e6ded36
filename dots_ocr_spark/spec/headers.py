"""Section-header level extraction / cleanup / rewrite (T6-T8).

Deterministic re-implementation of ``SectionHeader``
(`/root/reference/dots_ocr/utils/directory_entry.py:15-98`).

A header is represented as a plain dict:
``{"text", "category", "bbox", "level", "new_level", "clean_text", "cell_idx"}``
where ``cell_idx`` points back at the originating cell in the page's cell
list (the analog of the reference's ``source_block`` back-pointer).
"""

from __future__ import annotations

import re

#: categories considered headers for directory building
#: (directory_entry.py:144; the pipeline path passes
#: ["Section-header", "List-item"], ocr_task.py:575)
DEFAULT_HEADER_CATEGORIES = ["Title", "Section-header", "List-item"]

_HASH_RE = re.compile(r"^(#{1,6})\s+")
_BOLD_RE = re.compile(r"\*\*(.*?)\*\*")
_STRIP_HASH_RE = re.compile(r"^#{1,6}\s+")
_STRIP_BOLD_RE = re.compile(r"^\*\*(.*?)\*\*$")


def extract_level(text: str, category: str) -> int:
    """T6 — markdown-derived header level.

    Ref: directory_entry.py:36-54. Title → 0; ``^#{1,6}\\s`` → hash count;
    ``**…**`` anywhere → 7; default 8; List-item adds 10; any other
    category adds 20.
    """
    if category == "Title":
        return 0
    hash_match = _HASH_RE.match(text)
    bold_match = _BOLD_RE.search(text)
    tt = 8
    if hash_match:
        tt = len(hash_match.group(1))
    elif bold_match:
        tt = 7
    if category == "Section-header":
        return tt
    elif category == "List-item":
        return 10 + tt
    else:
        return 20 + tt


def clean_header_text(text: str) -> str:
    """T7 — strip leading ``#``s, then a full ``**…**`` wrap (after strip).

    Ref: directory_entry.py:56-60 (applied in this exact order).
    """
    text = _STRIP_HASH_RE.sub("", text)
    text = _STRIP_BOLD_RE.sub(r"\1", text.strip())
    return text


def make_header(cell: dict, cell_idx: int, level=None) -> dict:
    """Build a header record from a layout cell.

    Ref: directory_entry.py:15-34 (``SectionHeader.__init__`` /
    ``from_info_block``).
    """
    text = cell.get("text", "")
    category = cell["category"]
    lvl = level if level is not None else extract_level(text, category)
    return {
        "text": text,
        "category": category,
        "bbox": cell["bbox"],
        "level": lvl,
        "new_level": None,
        "clean_text": clean_header_text(text),
        "cell_idx": cell_idx,
    }


def rewrite_header(header: dict) -> tuple[str, str] | None:
    """T8 — rebuild text (and category) from ``new_level``.

    Ref: directory_entry.py:62-89 (``reset_text_and_update``). Returns
    ``(new_text, new_category)`` or None when ``new_level`` is unset.
    Empty lines of the cleaned text are dropped; level 1 → ``# `` with
    category ``title`` (lower-case, faithfully reproduced), 7 → bold
    Section-header, 8 → plain List-item, otherwise ``#``×level
    Section-header.
    """
    new_level = header["new_level"]
    if new_level is None:
        return None
    category = header["category"]
    formatted = []
    for line in header["clean_text"].split("\n"):
        if not line:
            continue
        if new_level == 1:
            category = "title"
            formatted.append("# " + line)
        elif new_level == 7:
            category = "Section-header"
            formatted.append("**" + line + "**")
        elif new_level == 8:
            category = "List-item"
            formatted.append(line)
        else:
            category = "Section-header"
            formatted.append("#" * new_level + " " + line)
    return "\n".join(formatted), category
