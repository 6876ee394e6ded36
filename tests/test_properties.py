"""Property-based gates (hypothesis) over the shared spec rules: the
oracle and the Spark UDFs run this exact code, so invariants proven here
hold for the whole engine."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from dots_ocr_spark.spec.cleaner import clean_model_output
from dots_ocr_spark.spec.geometry import smart_resize
from dots_ocr_spark.spec.toc import indel_ratio
from dots_ocr_spark.spec.xycut import reading_order

# --------------------------------------------------------------------------
# indel_ratio == the O(n·m) DP it replaced
# --------------------------------------------------------------------------

_text = st.text(alphabet="abcde #.12", max_size=40)


def _dp_ratio(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    if la == 0 or lb == 0:
        return 0.0
    prev = [0] * (lb + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            cur.append(prev[j] + 1 if ca == cb else max(cur[j], prev[j + 1]))
        prev = cur
    return 100.0 * 2.0 * prev[lb] / (la + lb)


@given(_text, _text)
@settings(max_examples=300, deadline=None)
def test_indel_ratio_matches_reference_dp(a, b):
    assert indel_ratio(a, b) == _dp_ratio(a, b)


@given(_text, _text)
@settings(max_examples=100, deadline=None)
def test_indel_ratio_symmetric_and_bounded(a, b):
    r = indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == indel_ratio(b, a)
    if a == b and a:
        assert r == 100.0


# --------------------------------------------------------------------------
# cleaner: total function over junk; fixpoint on its own output
# --------------------------------------------------------------------------

_junk = st.one_of(
    st.text(max_size=200),
    st.text(alphabet='{}[]",:bboxcategorytext0123456789 ', max_size=200),
)


@given(_junk)
@settings(max_examples=300, deadline=None)
def test_cleaner_never_raises(payload):
    cells = clean_model_output(payload)
    assert isinstance(cells, list)
    for c in cells:
        assert isinstance(c, dict)


@given(st.lists(
    st.fixed_dictionaries({
        "bbox": st.tuples(st.integers(0, 500), st.integers(0, 500),
                          st.integers(1, 400), st.integers(1, 400))
        .map(lambda t: [t[0], t[1], t[0] + t[2], t[1] + t[3]]),
        "category": st.sampled_from(["Text", "Title", "Table", "Formula"]),
        "text": st.text(alphabet="ab c", max_size=20),
    }), max_size=8))
@settings(max_examples=150, deadline=None)
def test_cleaner_fixpoint_on_valid_json(cells):
    once = clean_model_output(json.dumps(cells))
    twice = clean_model_output(json.dumps(once))
    assert once == twice


# --------------------------------------------------------------------------
# smart_resize: contract invariants
# --------------------------------------------------------------------------

@given(st.integers(28, 4000), st.integers(28, 4000))
@settings(max_examples=300, deadline=None)
def test_smart_resize_invariants(h, w):
    if max(h, w) / min(h, w) > 200:
        return
    nh, nw = smart_resize(h, w)
    assert nh % 28 == 0 and nw % 28 == 0
    assert 3136 <= nh * nw <= 11289600


# --------------------------------------------------------------------------
# reading order: permutation of the input never changes the visual order
# --------------------------------------------------------------------------

_grid_boxes = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 6)), min_size=1, max_size=10,
    unique=True,
).map(lambda cells: [
    [100 + c * 400, 150 + r * 220, 100 + c * 400 + 360, 150 + r * 220 + 180]
    for (c, r) in cells
])


@given(_grid_boxes, st.randoms())
@settings(max_examples=150, deadline=None)
def test_reading_order_permutation_invariant(boxes, rnd):
    base = [boxes[i] for i in reading_order(boxes)]
    perm = list(boxes)
    rnd.shuffle(perm)
    assert [perm[i] for i in reading_order(perm)] == base


@given(_grid_boxes)
@settings(max_examples=100, deadline=None)
def test_reading_order_is_a_permutation(boxes):
    order = reading_order(boxes)
    assert sorted(order) == list(range(len(boxes)))


# --------------------------------------------------------------------------
# fill_cell_texts (block-pruned) == clip_text (scalar spec) per cell
# --------------------------------------------------------------------------

_coord = st.integers(min_value=0, max_value=300)


@st.composite
def _word_layer(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    words = []
    for k in range(n):
        x0 = draw(_coord)
        y0 = draw(_coord)
        words.append([
            x0, y0,
            x0 + draw(st.integers(min_value=1, max_value=40)),
            y0 + draw(st.integers(min_value=1, max_value=20)),
            draw(st.sampled_from("abcdef")) + str(k),
            draw(st.integers(min_value=0, max_value=5)),   # block_no
            draw(st.integers(min_value=0, max_value=3)),   # line_no
            k,                                             # word_no
        ])
    return words


@st.composite
def _cells(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    out = []
    for _ in range(n):
        x0 = draw(_coord)
        y0 = draw(_coord)
        out.append({
            "bbox": [x0, y0, x0 + draw(st.integers(min_value=5, max_value=200)),
                     y0 + draw(st.integers(min_value=5, max_value=200))],
            "category": draw(st.sampled_from(
                ["Text", "Title", "Caption", "Table", "Picture"])),
        })
    return out


@given(_word_layer(), _cells(),
       st.sampled_from([1.0, 2.0, 200.0 / 72.0]))
@settings(max_examples=200, deadline=None)
def test_block_pruned_fill_equals_scalar_clip(words, cells, sf):
    from dots_ocr_spark.spec.words import (
        SKIP_CLIP_CATEGORIES,
        clip_text,
        fill_cell_texts,
    )

    filled = [dict(c) for c in cells]
    fill_cell_texts(filled, words, sf)
    for before, after in zip(cells, filled):
        if before["category"] in SKIP_CLIP_CATEGORIES:
            assert "text" not in after
        else:
            expected = clip_text(words, [v / sf for v in before["bbox"]])
            assert after["text"] == expected
