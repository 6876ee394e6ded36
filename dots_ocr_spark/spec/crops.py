"""A6 — crop-merge extents (the vertically-stacked merged-image layout).

Re-implementation of the extent arithmetic of ``merge_crops_and_parse``
(`/root/reference/dots_ocr/utils/directory_cleaner.py:125-141`) and its
rerank batching thresholds (directory_cleaner.py:108-116): crops stack
vertically onto a white canvas of ``max(width) × sum(height)``; the
y-offset list records each crop's BOTTOM edge (the reference appends
after advancing). A deprecated path in the reference, kept for operator
parity; the distributed analog is a plain ``agg(max, sum)`` +
running-sum window (see queries.q_crop_merge_extents).
"""

from __future__ import annotations

#: batching thresholds (directory_cleaner.py:14-15 usage at :108-116)
MAX_PIXELS = 11289600
MAX_LENGTH = 16000


def merge_crop_extents(sizes: list[tuple[int, int]]) -> dict:
    """Extent plan for merging crops of ``(width, height)`` vertically.

    Returns ``{"width", "height", "y_offsets"}`` where ``y_offsets[i]``
    is the bottom edge of crop ``i`` on the merged canvas.
    """
    if not sizes:
        return {"width": 0, "height": 0, "y_offsets": []}
    total_width = max(w for w, _ in sizes)
    y_offsets = []
    y = 0
    for _, h in sizes:
        y += h
        y_offsets.append(y)
    return {"width": total_width, "height": y, "y_offsets": y_offsets}


def batch_exceeds_limits(sum_height: int, max_width: int,
                         next_size: tuple[int, int]) -> bool:
    """True when adding ``next_size`` would push the merged image past the
    reference's rerank thresholds (h*w > MAX_PIXELS or h > MAX_LENGTH,
    directory_cleaner.py:108-112) — the caller then flushes the batch."""
    w, h = next_size
    new_h = sum_height + h
    new_w = max(max_width, w)
    return new_h * new_w > MAX_PIXELS or new_h > MAX_LENGTH
