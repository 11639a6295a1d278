"""Deterministic HTML ⇄ text conversion.

The reference pipeline starts from markdown files; the web-scale input
(``BASELINE.json`` input_hint) is Common-Crawl-style pages carrying both
``html:binary`` and ``text:string``. The per-url invariant this engine
guarantees (and tests byte-for-byte) is::

    html_to_text(page.html) == page.text

``render_html`` is the inverse used by the synthetic corpus generator:
markdown-ish text (``## `` / ``### `` headers, ``\\n\\n`` paragraphs) is
wrapped into minimal h2/h3/p HTML; ``html_to_text`` reconstructs the text
exactly. Both are pure functions run inside Arrow-batched UDFs.
"""

from __future__ import annotations

import re

_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]
_BLOCK_RE = re.compile(r"<(h2|h3|p)>(.*?)</\1>", re.DOTALL)


def _escape(s: str) -> str:
    for raw, esc in _ESCAPES:
        s = s.replace(raw, esc)
    return s


def _unescape(s: str) -> str:
    for raw, esc in reversed(_ESCAPES):
        s = s.replace(esc, raw)
    return s


def render_html(text: str) -> bytes:
    """Wrap markdown-ish text into minimal deterministic HTML (utf-8)."""
    blocks = []
    for block in text.split("\n\n"):
        if block.startswith("### "):
            blocks.append(f"<h3>{_escape(block[4:])}</h3>")
        elif block.startswith("## "):
            blocks.append(f"<h2>{_escape(block[3:])}</h2>")
        else:
            blocks.append(f"<p>{_escape(block)}</p>")
    body = "\n".join(blocks)
    return (
        '<html><head><meta charset="utf-8"></head><body>\n'
        + body
        + "\n</body></html>"
    ).encode("utf-8")


def html_to_text(html: bytes | str) -> str:
    """Deterministically extract text from a page's HTML.

    Inverse of :func:`render_html` for generator output; for foreign
    HTML it still yields a stable, whitespace-normalized text: h2→``## ``,
    h3→``### ``, p→paragraph, blocks joined by blank lines, all other
    markup dropped.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    out = []
    for tag, body in _BLOCK_RE.findall(html):
        body = _unescape(re.sub(r"<[^>]+>", "", body))
        if tag == "h2":
            out.append("## " + body)
        elif tag == "h3":
            out.append("### " + body)
        else:
            out.append(body)
    return "\n\n".join(out)
