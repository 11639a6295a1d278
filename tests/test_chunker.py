"""Golden-file byte-identity of the chunker vs reference TextSplitter
output (tests/golden/chunker_golden.json was produced by running the
READ-ONLY reference implementation once; see
scripts/make_chunker_golden.py)."""

import json
from pathlib import Path

from metal_history_knowledge_graph_spark.functions.chunker import split_text

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "chunker_golden.json").read_text()
)

CHECK_FIELDS = [
    "id", "chunk_index", "text", "start_char", "end_char",
    "section_header", "subsection_header", "char_count", "word_count",
]


def test_golden_byte_identity():
    assert len(GOLDEN) >= 9
    for name, case in GOLDEN.items():
        mine = split_text(case["text"], name)
        ref = case["chunks"]
        assert len(mine) == len(ref), f"{name}: chunk count"
        for m, r in zip(mine, ref):
            for k in CHECK_FIELDS:
                assert m[k] == r[k], f"{name} {m['id']} field {k}"


def test_empty_and_tiny():
    assert split_text("", "x") == []
    assert split_text("   \n\n  ", "x") == []
    # Headerless non-blank content is a single unheaded section chunk
    # (reference text_splitter.py:97-100) — min_chunk_size does NOT
    # apply on the section path.
    tiny = split_text("too short", "x")
    assert len(tiny) == 1 and tiny[0]["text"] == "too short"


def test_ids_deterministic():
    text = GOLDEN["sections_small.md"]["text"]
    a = split_text(text, "u")
    b = split_text(text, "u")
    assert [c["id"] for c in a] == [c["id"] for c in b]
    assert a[0]["id"] == "u_0000"
