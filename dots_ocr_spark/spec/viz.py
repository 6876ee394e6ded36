"""P10 — layout visualization (debug overlay).

Re-implementation of ``draw_layout_on_image``
(`/root/reference/dots_ocr/utils/layout_utils.py:31-119`) as an SVG
overlay instead of a fitz/PIL raster: same per-category colors
(layout_utils.py:15-29), same 0.3 fill opacity / 0.5 stroke width, same
``{order}_{category}`` label at ``(x1, y0 + 20)`` with font size 20, and
the same resized-space rescale arithmetic (layout_utils.py:77-84). Pure
string building — no image libraries required; the SVG wraps the page as
a plain rect (callers with a page raster can substitute an <image> href).
"""

from __future__ import annotations

from xml.sax.saxutils import escape

#: category → RGBA, verbatim from layout_utils.py:15-29
CATEGORY_COLORS = {
    "Text": (0, 128, 0, 256),
    "Picture": (255, 0, 255, 256),
    "Caption": (255, 165, 0, 256),
    "Section-header": (0, 255, 255, 256),
    "Footnote": (0, 128, 0, 256),
    "Formula": (128, 128, 128, 256),
    "Table": (255, 192, 203, 256),
    "Title": (255, 0, 0, 256),
    "List-item": (0, 0, 255, 256),
    "Page-header": (0, 128, 0, 256),
    "Page-footer": (128, 0, 128, 256),
    "Other": (165, 42, 42, 256),
    "Unknown": (0, 0, 0, 0),
}
_DEFAULT_COLOR = (0, 128, 0, 256)  # layout_utils.py:86 fallback


def cells_to_svg(
    cells: list[dict],
    width: int,
    height: int,
    resized_width: int | None = None,
    resized_height: int | None = None,
    fill_bbox: bool = True,
    draw_bbox: bool = True,
) -> str:
    """Render ordered cells as an SVG debug overlay.

    ``resized_*`` mirrors the reference exactly: when given, bbox coords
    are divided by ``resized/original`` per axis (mapping resized-space
    boxes back to page space, layout_utils.py:77-84).
    """
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    for order, cell in enumerate(cells):
        x0, y0, x1, y1 = cell["bbox"]
        category = cell.get("category", "Unknown")
        if resized_width and resized_height:
            scale_x = resized_width / width
            scale_y = resized_height / height
            x0, y0 = int(x0 / scale_x), int(y0 / scale_y)
            x1, y1 = int(x1 / scale_x), int(y1 / scale_y)
        r, g, b, _ = CATEGORY_COLORS.get(category, _DEFAULT_COLOR)
        rgb = f"rgb({r},{g},{b})"
        if draw_bbox:
            if fill_bbox:
                parts.append(
                    f'<rect x="{x0}" y="{y0}" width="{x1 - x0}" '
                    f'height="{y1 - y0}" fill="{rgb}" fill-opacity="0.3" '
                    f'stroke="none" stroke-width="0.5"/>'
                )
            else:
                parts.append(
                    f'<rect x="{x0}" y="{y0}" width="{x1 - x0}" '
                    f'height="{y1 - y0}" fill="none" stroke="{rgb}" '
                    f'stroke-width="0.5"/>'
                )
        label = escape(f"{order}_{category}")
        parts.append(
            f'<text x="{x1}" y="{y0 + 20}" font-size="20" '
            f'fill="{rgb}">{label}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)
