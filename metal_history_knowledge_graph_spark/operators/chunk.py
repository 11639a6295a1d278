"""pages → chunks: the deterministic HTML→text→chunks operator.

Narrow (no shuffle): one ``mapInPandas`` pass per page partition.
Replaces the reference's driver-side split loop
(``src/utils/text_splitter.py:301-323``) with per-partition vectorized
batches; the per-url output is byte-identical to the reference chunker
semantics (golden-tested in tests/test_chunker.py).

Chunk ids are ``{url}_{chunk_index:04d}`` (``text_splitter.py:124``) —
deterministic, so re-runs and resumes reproduce identical ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.chunker import (
    DEFAULT_CHUNK_SIZE,
    DEFAULT_MIN_CHUNK,
    DEFAULT_OVERLAP,
    split_text,
)
from ..functions.html_text import html_to_text

CHUNKS_SCHEMA = (
    "id string, url string, chunk_index int, text string, "
    "start_char long, end_char long, section_header string, "
    "subsection_header string, char_count int, word_count int, "
    "text_matches_crawl boolean"
)


def chunk_pages(
    pages: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    min_chunk: int = DEFAULT_MIN_CHUNK,
    use_html: bool = True,
) -> DataFrame:
    """Chunk every page. When ``use_html`` the text is re-extracted from
    the html column and ``text_matches_crawl`` records the byte-identity
    invariant per url (aggregated into stage metrics downstream)."""
    import pandas as pd

    cols = ["url", "html", "text"] if use_html else ["url", "text"]

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                if use_html:
                    text = html_to_text(rec.html)
                    matches = text == rec.text
                else:
                    text, matches = rec.text, True
                for c in split_text(text, rec.url, chunk_size, overlap, min_chunk):
                    c["text_matches_crawl"] = matches
                    rows.append(c)
            pdf_out = pd.DataFrame(
                rows,
                columns=["id", "url", "chunk_index", "text", "start_char", "end_char",
                         "section_header", "subsection_header", "char_count",
                         "word_count", "text_matches_crawl"],
            )
            yield pdf_out.astype(object).where(pdf_out.notna(), None)

    return pages.select(*cols).mapInPandas(run, schema=CHUNKS_SCHEMA)
