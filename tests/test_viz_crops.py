"""P10 SVG visualization + A6 crop-merge extents unit tests."""

import xml.etree.ElementTree as ET

from dots_ocr_spark.spec.crops import (
    MAX_LENGTH,
    batch_exceeds_limits,
    merge_crop_extents,
)
from dots_ocr_spark.spec.viz import CATEGORY_COLORS, cells_to_svg

CELLS = [
    {"bbox": [100, 150, 800, 250], "category": "Title", "text": "T"},
    {"bbox": [100, 300, 800, 400], "category": "Text", "text": "body"},
    {"bbox": [100, 450, 500, 700], "category": "Picture"},
]


def test_svg_wellformed_and_labeled():
    svg = cells_to_svg(CELLS, 1700, 2200)
    root = ET.fromstring(svg)  # must parse as XML
    texts = [t.text for t in root.iter("{http://www.w3.org/2000/svg}text")]
    # reference labels: "{order}_{category}" in cell order
    assert texts == ["0_Title", "1_Text", "2_Picture"]
    rects = root.findall("{http://www.w3.org/2000/svg}rect")
    assert len(rects) == 1 + len(CELLS)  # background + one per cell


def test_svg_colors_follow_reference_map():
    svg = cells_to_svg(CELLS, 1700, 2200)
    r, g, b, _ = CATEGORY_COLORS["Title"]
    assert f"rgb({r},{g},{b})" in svg
    r, g, b, _ = CATEGORY_COLORS["Picture"]
    assert f"rgb({r},{g},{b})" in svg


def test_svg_outline_mode_and_rescale():
    svg = cells_to_svg(CELLS, 1700, 2200, resized_width=3400,
                       resized_height=4400, fill_bbox=False)
    # scale_x = 2 => coords halved (layout_utils.py:77-84 semantics)
    assert 'x="50" y="75"' in svg
    assert 'fill="none"' in svg and 'fill-opacity="0.3"' not in svg


def test_merge_crop_extents():
    m = merge_crop_extents([(300, 100), (500, 250), (200, 50)])
    assert m["width"] == 500          # max width
    assert m["height"] == 400         # sum of heights
    assert m["y_offsets"] == [100, 350, 400]  # bottom edges
    assert merge_crop_extents([]) == {"width": 0, "height": 0,
                                      "y_offsets": []}


def test_batch_limits():
    assert not batch_exceeds_limits(0, 0, (1000, 1000))
    assert batch_exceeds_limits(MAX_LENGTH, 10, (10, 10))
    assert batch_exceeds_limits(4000, 4000, (4000, 4000))  # pixel budget
