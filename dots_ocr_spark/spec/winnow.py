"""Winnowing document-fingerprint spec (the MOSS local algorithm:
Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every K-char gram, keep the
minimum of each W-wide sliding window, fingerprint = the distinct
selected hashes. Guarantee: any shared substring of length >= K+W-1
between two documents yields at least one shared fingerprint.

Shared single source of truth for BOTH execution shapes registered with
the driver:

  * the scale-safe ``mapInPandas`` leg (queries.q_winnow_fingerprints)
    runs :func:`winnow_select` per document inside the scan task;
  * the exploded SQL-window leg (queries.q_winnow_fingerprints_exploded)
    re-expresses the same constants/hash/window-min as JVM expressions,
    and the DuckDB oracle mirrors them — parity tests keep all three
    honest.

Hash = first 15 hex chars of md5(gram) as int (signed-64-safe in every
engine).
"""

from __future__ import annotations

import hashlib
from collections import deque

#: k-gram size and window width (MOSS defaults scaled to the short
#: synthetic docs)
WINNOW_K = 8
WINNOW_W = 4


def gram_hash(gram: str) -> int:
    """First 15 hex chars of md5 as int — identical to the Spark
    ``conv(substring(md5(...), 1, 15), 16, 10)`` and the DuckDB
    ``CAST('0x' || ... AS BIGINT)`` forms."""
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)


def winnow_select(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    """Sorted distinct window-min hashes of ``text`` (empty when the
    text is too short to hold one full window). O(n) via a monotonic
    deque; ties are irrelevant because the selection keeps min VALUES,
    matching the SQL ``min() OVER (... ROWS w)`` exactly."""
    n = len(text)
    m = n - k + 1  # number of grams
    if m < w:
        return []
    # ASCII fast path: when the utf-8 encoding is byte-per-char, byte
    # slices equal char-slice encodings — one encode for the whole text
    # instead of one per gram (the md5 input is identical either way)
    data = text.encode("utf-8")
    if len(data) == n:
        hashes = (
            int(hashlib.md5(data[i:i + k]).hexdigest()[:15], 16)
            for i in range(m))
    else:
        hashes = (gram_hash(text[i:i + k]) for i in range(m))
    sel: set[int] = set()
    dq: deque[tuple[int, int]] = deque()  # (gram index, hash), increasing
    for i, h in enumerate(hashes):
        while dq and dq[-1][1] >= h:
            dq.pop()
        dq.append((i, h))
        if dq[0][0] <= i - w:
            dq.popleft()
        if i >= w - 1:
            sel.add(dq[0][1])
    return sorted(sel)


def fingerprints_md5(selected: list[int]) -> str:
    """Digest of the sorted selected-hash set — the cross-engine
    comparable fingerprint column."""
    return hashlib.md5(
        ",".join(str(x) for x in selected).encode("utf-8")).hexdigest()
