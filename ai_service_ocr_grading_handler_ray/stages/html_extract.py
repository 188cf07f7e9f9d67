"""Main-content extraction from HTML: jusText/Readability-style block
classification by text density + link density.

This is the engine's analogue of the reference's Stage-A extraction
("transcribe ... exactly as it is written, without any modifications",
``gen_ai_calling.py:205``; vision-OCR call at
``ocr_llm_calling_modules.py:49-79``) — re-expressed as a deterministic
local DOM heuristic instead of a remote vision LLM (SURVEY.md T5).

Design for byte-identical output (SURVEY.md §7.4):
- stdlib ``html.parser`` (no lxml in the container; version-stable),
- integer-arithmetic density thresholds (no float ties),
- whitespace normalization = ``" ".join(text.split())`` per block,
- block order = document order; output = kept blocks joined by "\\n\\n".

Classification rules (applied per flat block, in order):
1. blocks inside <nav>/<header>/<footer>/<aside> or an element whose
   id/class matches a boilerplate pattern are dropped (context rule);
2. blocks shorter than ``min_len`` normalized chars are dropped;
3. blocks whose link-char share exceeds ``max_link_pct`` percent are
   dropped (link farms, menus);
4. everything else is kept.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# tags that delimit text blocks
_BLOCK_TAGS = frozenset(
    """p div section article main li h1 h2 h3 h4 h5 h6 td th blockquote pre
    ul ol table tr figure figcaption dd dt form fieldset body html
    header footer nav aside""".split()
)
# subtrees whose text never reaches output
_SKIP_TAGS = frozenset("script style noscript template svg head iframe".split())
# subtrees that mark boilerplate context (rule 1)
_BOILER_TAGS = frozenset("nav header footer aside".split())
_VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())

_BOILER_ATTR = re.compile(
    r"(?:^|[\s_-])(nav|menu|footer|header|sidebar|banner|breadcrumb|comment|"
    r"share|social|related|promo|ad|ads|advert|cookie|popup|widget)(?:$|[\s_-])",
    re.IGNORECASE,
)


class Block:
    """One flat text block with link accounting.  ``text`` is normalized
    once at flush time (``__slots__`` + cached text: the block list is the
    allocation hot path at 100 TB — SURVEY.md §7.4 / VERDICT r01 #6)."""

    __slots__ = ("parts", "link_chars", "boiler_ctx", "text")

    def __init__(self, boiler_ctx: bool = False) -> None:
        self.parts: list[str] = []
        self.link_chars = 0
        self.boiler_ctx = boiler_ctx
        self.text = ""


class _BlockCollector(HTMLParser):
    """Single-pass SAX-style collector producing flat blocks in doc order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._cur = Block()
        self._skip_depth = 0
        self._boiler_depth = 0
        self._attr_boiler_stack: list[str] = []  # tags opened with boiler id/class
        self._link_depth = 0
        self.title_parts: list[str] = []
        self._in_title = False

    # -- helpers -------------------------------------------------------
    def _flush(self) -> None:
        cur = self._cur
        # cheap non-space probe first: whitespace-only blocks (the common
        # case between tags) never pay the join+split normalization
        if cur.parts and any(p and not p.isspace() for p in cur.parts):
            cur.text = " ".join("".join(cur.parts).split())
            if cur.text:
                self.blocks.append(cur)
        self._cur = Block(boiler_ctx=self._boiler_depth > 0 or bool(self._attr_boiler_stack))

    # -- parser callbacks ---------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in _VOID_TAGS:
            if tag == "br" and not self._skip_depth:
                self._cur.parts.append(" ")
            return
        if tag == "title":
            self._in_title = True
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
        attr_boiler = any(
            k in ("id", "class", "role") and v and _BOILER_ATTR.search(v) for k, v in attrs
        )
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BOILER_TAGS:
                self._boiler_depth += 1
            if attr_boiler:
                self._attr_boiler_stack.append(tag)
            self._cur.boiler_ctx = self._boiler_depth > 0 or bool(self._attr_boiler_stack)
        elif attr_boiler:
            # inline element flagged boilerplate: mark current block
            self._cur.boiler_ctx = True

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False
            return
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BOILER_TAGS:
                self._boiler_depth = max(0, self._boiler_depth - 1)
            if self._attr_boiler_stack and self._attr_boiler_stack[-1] == tag:
                self._attr_boiler_stack.pop()
            self._cur.boiler_ctx = self._boiler_depth > 0 or bool(self._attr_boiler_stack)

    def handle_data(self, data: str) -> None:
        if self._in_title:  # before the skip check: <title> lives in <head>
            self.title_parts.append(data)
            return
        if self._skip_depth:
            return
        if not data:
            return
        self._cur.parts.append(data)
        if self._link_depth:
            self._cur.link_chars += len(" ".join(data.split()))


def extract_html_with_title(
    payload: bytes | str,
    min_len: int = 25,
    max_link_pct: int = 33,
) -> tuple[str, int, str]:
    """Strip boilerplate; return ``(extracted_text, n_kept_blocks, title)``.

    Deterministic: integer thresholds, document-order blocks, no float
    comparisons.  Never raises on malformed HTML (html.parser is lenient);
    decoding uses UTF-8 with replacement so garbage can't throw.
    """
    if isinstance(payload, bytes):
        doc = payload.decode("utf-8", errors="replace")
    else:
        doc = payload
    coll = _BlockCollector()
    coll.feed(doc)
    coll.close()
    coll._flush()

    kept: list[str] = []
    for blk in coll.blocks:
        if blk.boiler_ctx:
            continue
        text = blk.text  # normalized once at flush
        n = len(text)
        if n < min_len:
            continue
        # integer-arithmetic link density: link_chars/n > max_link_pct/100
        if blk.link_chars * 100 > n * max_link_pct:
            continue
        kept.append(text)
    title = " ".join("".join(coll.title_parts).split())
    return "\n\n".join(kept), len(kept), title


def extract_html(
    payload: bytes | str,
    min_len: int = 25,
    max_link_pct: int = 33,
) -> tuple[str, int]:
    """Back-compat wrapper: ``(extracted_text, n_kept_blocks)``."""
    text, n, _title = extract_html_with_title(payload, min_len, max_link_pct)
    return text, n


# --- fast tokenizer path ----------------------------------------------------
#
# html.parser spends ~1.5 ms/page in its char-by-char goahead loop; this
# regex scanner drives the SAME _BlockCollector callbacks ~4-5x faster.
# Equivalence with the stdlib path is asserted over the whole synthetic
# corpus in tests (byte-identical extracted text) and both paths are total
# on arbitrary bytes.  Block classification logic is shared — only
# tokenization differs.

import html as _html

_TAG_RE = re.compile(
    r"<(?:"
    r"!--.*?(?:-->|$)"  # comments (unterminated → to EOF)
    r"|!\[CDATA\[.*?(?:\]\]>|$)"
    r"|[!?][^>]*>?"  # doctype / processing instruction
    r"|(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>?"
    r")",
    re.DOTALL,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z:_-]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*))"
)
_RAWTEXT = frozenset(("script", "style", "textarea"))
_ATTR_HINT = re.compile(r"\b(?:id|class|role)\s*=", re.IGNORECASE)


# tags whose start/end callbacks can change collector state; any other
# tag WITHOUT a boilerplate-attr hint is a no-op in the collector, so the
# scanner skips the callback entirely (most inline tags: span/b/i/em/...)
_EVENT_TAGS = frozenset(
    _BLOCK_TAGS | _SKIP_TAGS | _VOID_TAGS | _RAWTEXT | {"a", "title"}
)


def _scan_html(doc: str, coll: _BlockCollector) -> None:
    """Emit start/end/data events into the collector (fast path)."""
    pos = 0
    n = len(doc)
    handle_data = coll.handle_data
    search = _TAG_RE.search
    event_tags = _EVENT_TAGS
    while pos < n:
        m = search(doc, pos)
        if m is None:
            data = doc[pos:]
            if data:
                handle_data(_html.unescape(data) if "&" in data else data)
            break
        if m.start() > pos:
            data = doc[pos : m.start()]
            handle_data(_html.unescape(data) if "&" in data else data)
        pos = m.end()
        closer, tag, rawattrs = m.group(1, 2, 3)
        if tag is None:
            continue  # comment / doctype / PI
        if not tag.islower():
            tag = tag.lower()
        if closer:
            if tag in event_tags:
                coll.handle_endtag(tag)
            continue
        attrs: list[tuple[str, str | None]] = []
        if rawattrs and _ATTR_HINT.search(rawattrs):
            for am in _ATTR_RE.finditer(rawattrs):
                val = am.group(2) or am.group(3) or am.group(4) or ""
                attrs.append((am.group(1).lower(), val))
        if tag in event_tags or attrs:
            coll.handle_starttag(tag, attrs)
        self_closing = rawattrs is not None and rawattrs.rstrip().endswith("/")
        if self_closing and tag not in _VOID_TAGS:
            if tag in event_tags or attrs:
                coll.handle_endtag(tag)
            continue
        if tag in _RAWTEXT:
            # raw-text element: content runs to the matching close tag
            cm = _CLOSE_RE[tag].search(doc, pos)
            if cm is None:
                coll.handle_endtag(tag)  # unterminated: drop rest as raw
                break
            pos = cm.end()
            coll.handle_endtag(tag)
        elif tag == "title":
            # collector handles title via _in_title; feed its text directly
            cm = _CLOSE_RE["title"].search(doc, pos)
            text = doc[pos : cm.start()] if cm else doc[pos:]
            coll.handle_data(_html.unescape(text) if "&" in text else text)
            pos = cm.end() if cm else n
            coll.handle_endtag("title")


# precompiled raw-text close patterns (the scanner previously recompiled
# these per occurrence)
_CLOSE_RE = {
    t: re.compile(rf"</{t}\s*>", re.IGNORECASE) for t in (*_RAWTEXT, "title")
}


def extract_html_fused(
    payload: bytes | str,
    min_len: int = 25,
    max_link_pct: int = 33,
) -> tuple[str, int, str]:
    """Fully-fused twin of extract_html_fast: tokenizer + block state
    machine + classification in ONE function with local state — no
    per-event method calls, no Block objects, no per-block list.  At 32-way
    concurrency the extract stage is DRAM-bound (VERDICT r01 #6); this
    path exists to cut Python-object allocation traffic.  Byte-identical
    to the other two engines (equivalence-tested over the corpus)."""
    if isinstance(payload, bytes):
        doc = payload.decode("utf-8", errors="replace")
    else:
        doc = payload

    kept: list[str] = []
    title_parts: list[str] = []
    in_title = False
    skip_depth = 0
    boiler_depth = 0
    attr_stack: list[str] = []
    link_depth = 0
    parts: list[str] = []
    link_chars = 0
    cur_boiler = False

    pos = 0
    n = len(doc)
    search = _TAG_RE.search
    unescape = _html.unescape
    event_tags = _EVENT_TAGS
    block_tags = _BLOCK_TAGS
    skip_tags = _SKIP_TAGS
    void_tags = _VOID_TAGS
    boiler_tags = _BOILER_TAGS

    while pos < n:
        m = search(doc, pos)
        if m is None:
            data = doc[pos:]
            if data:
                if in_title:
                    title_parts.append(unescape(data) if "&" in data else data)
                elif not skip_depth:
                    d = unescape(data) if "&" in data else data
                    parts.append(d)
                    if link_depth:
                        link_chars += len(" ".join(d.split()))
            break
        st = m.start()
        if st > pos:
            data = doc[pos:st]
            if in_title:
                title_parts.append(unescape(data) if "&" in data else data)
            elif not skip_depth:
                d = unescape(data) if "&" in data else data
                parts.append(d)
                if link_depth:
                    link_chars += len(" ".join(d.split()))
        pos = m.end()
        closer, tag, rawattrs = m.group(1, 2, 3)
        if tag is None:
            continue  # comment / doctype / PI
        if not tag.islower():
            tag = tag.lower()

        if closer:
            if tag not in event_tags:
                continue
            # --- end-tag chain (mirrors handle_endtag) ---
            if tag == "title":
                in_title = False
                continue
            if tag in skip_tags:
                if skip_depth:
                    skip_depth -= 1
                continue
            if skip_depth:
                continue
            if tag == "a":
                if link_depth:
                    link_depth -= 1
            if tag in block_tags:
                if parts:
                    if any(p and not p.isspace() for p in parts):
                        text = " ".join("".join(parts).split())
                        if text and not cur_boiler:
                            tl = len(text)
                            if tl >= min_len and link_chars * 100 <= tl * max_link_pct:
                                kept.append(text)
                    parts = []
                    link_chars = 0
                if tag in boiler_tags:
                    if boiler_depth:
                        boiler_depth -= 1
                if attr_stack and attr_stack[-1] == tag:
                    attr_stack.pop()
                cur_boiler = boiler_depth > 0 or bool(attr_stack)
            continue

        # --- start-tag chain (mirrors handle_starttag) ---
        hint = rawattrs and _ATTR_HINT.search(rawattrs)
        if tag in event_tags or hint:
            if tag in void_tags:
                if tag == "br" and not skip_depth:
                    parts.append(" ")
                continue
            if tag == "title":
                in_title = True
            elif tag in skip_tags:
                skip_depth += 1
            elif skip_depth:
                pass
            else:
                if tag == "a":
                    link_depth += 1
                attr_boiler = False
                if hint:
                    for am in _ATTR_RE.finditer(rawattrs):
                        if am.group(1).lower() in ("id", "class", "role"):
                            val = am.group(2) or am.group(3) or am.group(4) or ""
                            if val and _BOILER_ATTR.search(val):
                                attr_boiler = True
                                break
                if tag in block_tags:
                    if parts:
                        if any(p and not p.isspace() for p in parts):
                            text = " ".join("".join(parts).split())
                            if text and not cur_boiler:
                                tl = len(text)
                                if tl >= min_len and link_chars * 100 <= tl * max_link_pct:
                                    kept.append(text)
                        parts = []
                        link_chars = 0
                    if tag in boiler_tags:
                        boiler_depth += 1
                    if attr_boiler:
                        attr_stack.append(tag)
                    cur_boiler = boiler_depth > 0 or bool(attr_stack)
                elif attr_boiler:
                    cur_boiler = True

        if rawattrs is not None and rawattrs.rstrip().endswith("/") and tag not in void_tags:
            # self-closing non-void: run the end-tag chain inline
            if tag in event_tags:
                if tag == "title":
                    in_title = False
                elif tag in skip_tags:
                    if skip_depth:
                        skip_depth -= 1
                elif skip_depth:
                    pass
                else:
                    if tag == "a":
                        if link_depth:
                            link_depth -= 1
                    if tag in block_tags:
                        if parts:
                            if any(p and not p.isspace() for p in parts):
                                text = " ".join("".join(parts).split())
                                if text and not cur_boiler:
                                    tl = len(text)
                                    if tl >= min_len and link_chars * 100 <= tl * max_link_pct:
                                        kept.append(text)
                            parts = []
                            link_chars = 0
                        if tag in boiler_tags:
                            if boiler_depth:
                                boiler_depth -= 1
                        if attr_stack and attr_stack[-1] == tag:
                            attr_stack.pop()
                        cur_boiler = boiler_depth > 0 or bool(attr_stack)
            continue
        if tag in _RAWTEXT:
            cm = _CLOSE_RE[tag].search(doc, pos)
            # end-tag chain: script/style are skip tags (decrement);
            # textarea is raw-text only (its end is a collector no-op)
            if tag in skip_tags and skip_depth:
                skip_depth -= 1
            if cm is None:
                break
            pos = cm.end()
        elif tag == "title":
            cm = _CLOSE_RE["title"].search(doc, pos)
            text = doc[pos : cm.start()] if cm else doc[pos:]
            title_parts.append(unescape(text) if "&" in text else text)
            pos = cm.end() if cm else n
            in_title = False

    # final flush (parser close)
    if parts and any(p and not p.isspace() for p in parts):
        text = " ".join("".join(parts).split())
        if text and not cur_boiler:
            tl = len(text)
            if tl >= min_len and link_chars * 100 <= tl * max_link_pct:
                kept.append(text)

    title = " ".join("".join(title_parts).split())
    return "\n\n".join(kept), len(kept), title


def extract_html_fast(
    payload: bytes | str,
    min_len: int = 25,
    max_link_pct: int = 33,
) -> tuple[str, int, str]:
    """Fast-tokenizer twin of extract_html_with_title (same outputs)."""
    if isinstance(payload, bytes):
        doc = payload.decode("utf-8", errors="replace")
    else:
        doc = payload
    coll = _BlockCollector()
    _scan_html(doc, coll)
    coll._flush()
    kept: list[str] = []
    for blk in coll.blocks:
        if blk.boiler_ctx:
            continue
        text = blk.text  # normalized once at flush
        nchars = len(text)
        if nchars < min_len:
            continue
        if blk.link_chars * 100 > nchars * max_link_pct:
            continue
        kept.append(text)
    title = " ".join("".join(coll.title_parts).split())
    return "\n\n".join(kept), len(kept), title
