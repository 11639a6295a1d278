"""Deterministic markdown chunker.

Reproduces, output-byte-identically, the chunking semantics of the
reference's ``src/utils/text_splitter.py:84-299`` (section split on
``##``, subsection split on ``###``, paragraph packing with one-paragraph
overlap, fixed-window fallback) — including its quirks:

* the section/subsection pairing skips the first header's body when
  there is non-blank content before the first header
  (``text_splitter.py:95-105`` iterates split output in steps of 2);
* ``start_char``/``end_char`` are the reference's running-position
  bookkeeping, not true offsets into the source;
* the final paragraph-packed chunk is dropped when its accumulated
  size (including +2 separators) is below ``min_chunk_size``
  (``text_splitter.py:254``).

Defaults chunk_size=2500 / overlap=200 / min_chunk_size=500 per
``text_splitter.py:44-58``. Golden-file tested against reference output
(tests/golden/chunker_golden.json).

This is a pure function of (text, source_id) so it is safe inside a
``mapInPandas`` batch and trivially deterministic per url.
"""

from __future__ import annotations

import re
from typing import Optional

_SECTION_RE = re.compile(r"^(##\s+[^\n]+)$", re.MULTILINE)
_SUBSECTION_RE = re.compile(r"^(###\s+[^\n]+)$", re.MULTILINE)

DEFAULT_CHUNK_SIZE = 2500
DEFAULT_OVERLAP = 200
DEFAULT_MIN_CHUNK = 500


def _chunk_row(
    source_id: str,
    index: int,
    text: str,
    start: int,
    end: int,
    section: Optional[str],
    subsection: Optional[str],
) -> dict:
    return {
        "id": f"{source_id}_{index:04d}",
        "url": source_id,
        "chunk_index": index,
        "text": text,
        "start_char": start,
        "end_char": end,
        "section_header": section,
        "subsection_header": subsection,
        "char_count": len(text),
        "word_count": len(text.split()),
    }


def _header_body_pairs(parts: list[str]) -> list[tuple[Optional[str], str]]:
    """Walk a capturing re.split output the way the reference does
    (step-2 index walk): yields (header, body) pairs, emitting leading
    unheaded content and — faithfully — skipping the first header's
    body whenever that leading content is non-blank."""
    pairs: list[tuple[Optional[str], str]] = []
    for i in range(0, len(parts), 2):
        if i == 0 and parts[0].strip():
            header, body = None, parts[0]
        elif i + 1 < len(parts):
            header = parts[i + 1].strip()
            body = parts[i + 2] if i + 2 < len(parts) else ""
        else:
            continue
        if body.strip():
            pairs.append((header, body))
    return pairs


def _pack_paragraphs(
    body: str,
    source_id: str,
    section: Optional[str],
    subsection: Optional[str],
    position: int,
    index: int,
    chunk_size: int,
    overlap: int,
    min_chunk: int,
) -> list[dict]:
    """Greedy paragraph packing with single-paragraph overlap
    (semantics of text_splitter.py:198-268)."""
    out: list[dict] = []
    bucket: list[str] = []
    size = 0
    start = position
    for para in (p.strip() for p in body.split("\n\n")):
        if not para:
            continue
        if bucket and size + len(para) > chunk_size:
            joined = "\n\n".join(bucket)
            out.append(
                _chunk_row(source_id, index, joined, start, start + len(joined), section, subsection)
            )
            index += 1
            if overlap > 0 and len(bucket) > 1:
                carry = bucket[-1]
                bucket = [carry, para]
                size = len(carry) + len(para)
                start = start + len(joined) - len(carry)
            else:
                bucket = [para]
                size = len(para)
                start = start + len(joined) + 2
        else:
            bucket.append(para)
            size += len(para) + 2
    if bucket and size >= min_chunk:
        joined = "\n\n".join(bucket)
        out.append(
            _chunk_row(source_id, index, joined, start, start + len(joined), section, subsection)
        )
    return out


def _fixed_windows(
    content: str, source_id: str, chunk_size: int, overlap: int, min_chunk: int
) -> list[dict]:
    """Structure-free fallback: fixed stride windows extended ≤200 chars
    to the next blank line (text_splitter.py:270-299)."""
    out: list[dict] = []
    index = 0
    for lo in range(0, len(content), chunk_size - overlap):
        hi = min(lo + chunk_size, len(content))
        if hi < len(content):
            boundary = content.find("\n\n", hi)
            if boundary != -1 and boundary - hi < 200:
                hi = boundary
        text = content[lo:hi].strip()
        if len(text) >= min_chunk:
            out.append(_chunk_row(source_id, index, text, lo, hi, None, None))
            index += 1
    return out


def split_text(
    content: str,
    source_id: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    min_chunk: int = DEFAULT_MIN_CHUNK,
) -> list[dict]:
    """Split one document into chunk rows (see module docstring)."""
    chunks: list[dict] = []
    position = 0
    index = 0
    for section, body in _header_body_pairs(_SECTION_RE.split(content)):
        if len(body) > chunk_size * 1.5:
            sub_position = position
            for subsection, sub_body in _header_body_pairs(_SUBSECTION_RE.split(body)):
                if len(sub_body) > chunk_size:
                    packed = _pack_paragraphs(
                        sub_body, source_id, section, subsection,
                        sub_position, index, chunk_size, overlap, min_chunk,
                    )
                    chunks.extend(packed)
                    index += len(packed)
                else:
                    chunks.append(
                        _chunk_row(
                            source_id, index, sub_body.strip(),
                            sub_position, sub_position + len(sub_body),
                            section, subsection,
                        )
                    )
                    index += 1
                sub_position += len(subsection or "") + len(sub_body)
        else:
            chunks.append(
                _chunk_row(
                    source_id, index, body.strip(),
                    position, position + len(body), section, None,
                )
            )
            index += 1
        position += len(section or "") + len(body)
    if not chunks:
        chunks = _fixed_windows(content, source_id, chunk_size, overlap, min_chunk)
    return chunks
