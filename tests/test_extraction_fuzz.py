"""Property-based extraction test: for ANY span sequence the corpus grammar
can produce (not just the seeded fixtures), rendering + boilerplate-strip
must return exactly the input spans (kind, text, media_ref, order)."""

import random

from hypothesis import given, settings, strategies as st

from docling_metrics_spark.datagen import _make_table_html, _render_html
from docling_metrics_spark.extraction.html_extract import extract_spans_from_html

# corpus text contract: space-separated words over a safe charset (the
# renderer emits span text verbatim; markup characters are out of contract)
_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=12
)
_text = st.lists(_word, min_size=1, max_size=25).map(" ".join)


@st.composite
def _spans(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    rng = random.Random(draw(st.integers(0, 2**32)))
    out = []
    for i in range(n):
        kind = draw(st.sampled_from(["text", "text", "heading", "image", "table"]))
        if kind == "image":
            out.append({"kind": "image", "text": None,
                        "media_ref": f"media://fuzz/{i}", "offset": i})
        elif kind == "table":
            out.append({"kind": "table", "text": _make_table_html(rng),
                        "media_ref": None, "offset": i})
        else:
            out.append({"kind": kind, "text": draw(_text),
                        "media_ref": None, "offset": i})
    return out


@settings(max_examples=60, deadline=None)
@given(spans=_spans(), seed=st.integers(0, 2**32))
def test_render_extract_roundtrip(spans, seed):
    html = _render_html(random.Random(seed), "doc_fuzz", spans)
    assert extract_spans_from_html(html) == spans
