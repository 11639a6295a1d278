#!/usr/bin/env python3
"""One-off golden-file generator: runs the READ-ONLY reference chunker
(/root/reference/src/utils/text_splitter.py) on a set of adversarial
synthetic texts and records its output as test vectors
(tests/golden/chunker_golden.json). The golden file is committed; the
reference is never imported by the engine or its test suite at runtime.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/reference/src/utils")
from text_splitter import TextSplitter  # noqa: E402  (reference, read-only)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _para(seed: str, n: int) -> str:
    """Deterministic filler paragraph of roughly n chars."""
    words = (f"{seed}word{i}" for i in range(10_000))
    out, size = [], 0
    for w in words:
        out.append(w)
        size += len(w) + 1
        if size >= n:
            break
    return " ".join(out)


def build_cases() -> dict[str, str]:
    cases = {}
    # 1. Plain sections, small bodies.
    cases["sections_small.md"] = (
        "## Origins\n\nBlack Sabbath formed in Birmingham, England in 1968.\n\n"
        "They pioneered heavy metal.\n\n"
        "## NWOBHM\n\nIron Maiden emerged from East London in 1975.\n"
    )
    # 2. Leading content before first section header (pairing quirk).
    cases["leading_content.md"] = (
        "Intro paragraph before any header, long enough to matter.\n\n"
        "## First\n\nBody of first section.\n\n"
        "## Second\n\nBody of second section.\n"
    )
    # 3. Large section → subsections.
    cases["subsections.md"] = (
        "## Big Section\n\n"
        + "### Sub A\n\n" + _para("a", 1200) + "\n\n"
        + "### Sub B\n\n" + _para("b", 1300) + "\n\n"
        + "### Sub C\n\n" + _para("c", 1400) + "\n\n"
        + "## Small\n\nTiny body.\n"
    )
    # 4. Large subsection → paragraph packing with overlap.
    big_paras = "\n\n".join(_para(f"p{i}", 700) for i in range(12))
    cases["paragraph_overlap.md"] = (
        "## Huge\n\n### Dense\n\n" + big_paras + "\n\n### Tail\n\nshort tail body here.\n"
    )
    # 5. No structure at all → fixed-window fallback.
    cases["no_structure.md"] = "\n\n".join(_para(f"q{i}", 600) for i in range(10))
    # 6. No structure, short → dropped below min_chunk_size.
    cases["too_short.md"] = "tiny.\n\nvery tiny."
    # 7. Section exactly around 1.5x boundary.
    cases["boundary.md"] = "## Edge\n\n" + _para("edge", 3748) + "\n"
    # 8. Unicode (Motörhead) + windows newlines mixed.
    cases["unicode.md"] = (
        "## Motörhead\n\nMotörhead was formed in 1975 by Lemmy Kilmister. "
        "Blue Öyster Cult inspired the umlaut.\n\n"
        "##続き\n\n日本のメタルシーンも重要である。" + _para("u", 520) + "\n"
    )
    # 9. Large section with leading content before first subsection.
    cases["sub_leading.md"] = (
        "## Outer\n\n" + _para("lead", 900) + "\n\n"
        "### Inner One\n\n" + _para("x", 800) + "\n\n"
        "### Inner Two\n\n" + _para("y", 3200) + "\n"
    )
    return cases


def main() -> None:
    splitter = TextSplitter()  # defaults: 2500/200/500
    golden = {}
    for name, text in build_cases().items():
        tmp = Path("/tmp") / name
        tmp.write_text(text, encoding="utf-8")
        chunks = [c.to_dict() for c in splitter.split_document(str(tmp))]
        golden[name] = {"text": text, "chunks": chunks}
    out = REPO / "tests" / "golden" / "chunker_golden.json"
    out.write_text(json.dumps(golden, ensure_ascii=False, indent=1), encoding="utf-8")
    total = sum(len(v["chunks"]) for v in golden.values())
    print(f"wrote {out} with {len(golden)} cases / {total} chunks")


if __name__ == "__main__":
    main()
