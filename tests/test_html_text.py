"""Byte-identity of the HTML→text invariant over generated pages."""

from metal_history_knowledge_graph_spark.functions.html_text import (
    html_to_text,
    render_html,
)
from metal_history_knowledge_graph_spark.sources.corpus import build_page


def test_round_trip_over_corpus():
    for pid in range(120):
        page = build_page(pid, seed=42)
        assert html_to_text(page["html"]) == page["text"], page["url"]


def test_escaping():
    text = "## A & B\n\nx < y > z & done"
    assert html_to_text(render_html(text)) == text


def test_foreign_markup_dropped():
    html = b"<html><body><p>hello <b>bold</b> world</p><script>x</script></body></html>"
    assert html_to_text(html) == "hello bold world"
