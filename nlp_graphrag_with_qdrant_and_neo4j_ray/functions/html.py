"""Deterministic HTML→text extraction and its exact inverse renderer.

The reference reads ``.txt`` files directly (utf-8 with a latin-1 fallback,
/root/reference/graphrag/cli/main.py:135-143); the engine's input is a
``pages`` table with ``html:binary`` (BASELINE.json input_hint), so the
decode-fallback policy becomes part of the extract stage and the per-row
invariant is: ``extract_text(render_html(doc_id, text)) == text`` —
byte-identical per url (north_rule).
"""

from __future__ import annotations

import html as _html
import re

_P_BLOCK = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
_SCRIPT_STYLE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_NL_RUN = re.compile(r"\n{3,}")


def render_html(doc_id: str, text: str) -> bytes:
    """Deterministic fixture wrapper (FIXTURES.md §1): one ``<p>`` per
    source paragraph (paragraphs are ``\\n\\n``-separated), UTF-8."""
    parts = [f"<html><head><title>{_html.escape(doc_id)}</title></head><body>"]
    for para in text.split("\n\n"):
        parts.append(f"<p>{_html.escape(para)}</p>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def decode_html(raw: bytes) -> str:
    """UTF-8 with deterministic latin-1 fallback (the reference's read
    policy, cli/main.py:135-143, made a per-row rule)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def extract_text(raw: bytes) -> str:
    """HTML→text. If the document contains ``<p>`` blocks, text is the
    unescaped block contents joined with ``\\n\\n`` (the exact inverse of
    :func:`render_html`). Otherwise fall back to a generic deterministic
    strip: drop script/style, replace tags with newlines at block
    boundaries, unescape entities, normalize whitespace runs."""
    doc = decode_html(raw)
    blocks = _P_BLOCK.findall(doc)
    if blocks:
        return "\n\n".join(_html.unescape(b) for b in blocks)
    doc = _SCRIPT_STYLE.sub(" ", doc)
    doc = re.sub(r"(?i)<(br|/p|/div|/h[1-6]|/li|/tr)\b[^>]*>", "\n", doc)
    doc = _TAG.sub(" ", doc)
    doc = _html.unescape(doc)
    doc = _WS_RUN.sub(" ", doc)
    doc = "\n".join(line.strip() for line in doc.split("\n"))
    doc = _NL_RUN.sub("\n\n", doc)
    return doc.strip()


_HREF = re.compile(r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)')""",
                   re.IGNORECASE | re.DOTALL)
_SKIP_SCHEMES = ("#", "mailto:", "javascript:", "tel:", "data:", "ftp:")


def extract_links(raw: bytes, base_url: str) -> list[str]:
    """All outgoing http(s) anchor targets of an HTML capture, relative
    hrefs resolved against ``base_url`` (RFC 3986 via urljoin);
    fragments-only / mailto / javascript / tel / data links dropped.
    Order preserved, duplicates kept (multiplicity is signal for the
    host-graph edge weights). Compiled-regex scan — the per-doc findall
    IS the irreducible work of link extraction; no per-row Python beyond
    it."""
    from urllib.parse import urljoin

    doc = decode_html(raw)
    out: list[str] = []
    for m in _HREF.finditer(doc):
        href = (m.group(1) or m.group(2) or "").strip()
        if not href or href.lower().startswith(_SKIP_SCHEMES):
            continue
        url = urljoin(base_url, href)
        if url.startswith(("http://", "https://")):
            out.append(url)
    return out


_ANCHOR = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)')[^>]*>(.*?)</a>""",
    re.IGNORECASE | re.DOTALL,
)
_INNER_TAG = re.compile(r"<[^>]+>")
_ANCHOR_WS = re.compile(r"\s+")


def extract_anchor_texts(raw: bytes, base_url: str) -> list[tuple[str, str]]:
    """``(target_url, anchor_text)`` pairs of an HTML capture — the
    visible text of each link, with inner markup stripped and
    whitespace collapsed (image-only anchors keep ``""``).  Same href
    resolution and noise-scheme filtering as :func:`extract_links`;
    anchors without a closing tag are skipped (the href-only scan above
    stays the authority for link EDGES)."""
    from urllib.parse import urljoin

    doc = decode_html(raw)
    out: list[tuple[str, str]] = []
    for m in _ANCHOR.finditer(doc):
        href = (m.group(1) or m.group(2) or "").strip()
        if not href or href.lower().startswith(_SKIP_SCHEMES):
            continue
        url = urljoin(base_url, href)
        if not url.startswith(("http://", "https://")):
            continue
        text = _ANCHOR_WS.sub(" ", _INNER_TAG.sub("", m.group(3))).strip()
        out.append((url, text))
    return out


_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_META_NC = re.compile(
    r"""<meta\s[^>]*?name\s*=\s*["']description["'][^>]*?"""
    r"""content\s*=\s*["']([^"']*)["']""",
    re.IGNORECASE | re.DOTALL,
)
_META_CN = re.compile(
    r"""<meta\s[^>]*?content\s*=\s*["']([^"']*)["'][^>]*?"""
    r"""name\s*=\s*["']description["']""",
    re.IGNORECASE | re.DOTALL,
)
_CANONICAL = re.compile(
    r"""<link\s[^>]*?rel\s*=\s*["']canonical["'][^>]*?"""
    r"""href\s*=\s*["']([^"']*)["']""",
    re.IGNORECASE | re.DOTALL,
)
_OG_TITLE = re.compile(
    r"""<meta\s[^>]*?property\s*=\s*["']og:title["'][^>]*?"""
    r"""content\s*=\s*["']([^"']*)["']""",
    re.IGNORECASE | re.DOTALL,
)


def _clean_meta(value: str) -> str:
    return _ANCHOR_WS.sub(" ", _html.unescape(value)).strip()


def extract_metadata(raw: bytes) -> dict[str, str | None]:
    """Page-level metadata a curation/KG pipeline mines from raw HTML:
    ``title`` (inner tags stripped), ``meta_description`` (either
    attribute order), ``canonical_url`` (the site's own dedup hint —
    feed it to ``web.dedup_recrawls``) and ``og_title``.  Values are
    entity-unescaped with whitespace collapsed; absent fields are
    ``None``.  First occurrence wins, matching browser behavior."""
    doc = decode_html(raw)
    title = _TITLE.search(doc)
    desc = _META_NC.search(doc) or _META_CN.search(doc)
    canon = _CANONICAL.search(doc)
    og = _OG_TITLE.search(doc)
    return {
        "title": _clean_meta(_INNER_TAG.sub("", title.group(1)))
        if title else None,
        "meta_description": _clean_meta(desc.group(1)) if desc else None,
        "canonical_url": canon.group(1).strip() if canon else None,
        "og_title": _clean_meta(og.group(1)) if og else None,
    }


_BLOCK_TAG = re.compile(
    r"(?i)</?(?:p|div|h[1-6]|li|td|th|blockquote|article|section|"
    r"header|footer|nav|table|tr|ul|ol|body|html|head)\b[^>]*>")
_ANY_ANCHOR = re.compile(r"<a\s[^>]*>(.*?)</a>", re.IGNORECASE | re.DOTALL)


def justext_blocks(raw: bytes, stopwords: tuple[str, ...],
                   length_low: int = 70, length_high: int = 200,
                   stopwords_low: float = 0.30,
                   stopwords_high: float = 0.32,
                   max_link_density: float = 0.2) -> list[tuple[str, str]]:
    """jusText-style main-content block classification (Pomikálek 2011,
    the published heuristics; thresholds are the paper's defaults).

    Segmentation: the HTML splits at block-level tags; each non-empty
    segment becomes one block (inline markup stays inside and is
    stripped for the text).  Context-free pass per block over its
    cleaned text:

    - ``link_density`` (anchor-text chars / total chars) >
      ``max_link_density`` → bad
    - contains a copyright sign → bad
    - shorter than ``length_low``: bad if it has any link chars, else
      short (undecided)
    - stopword density < ``stopwords_low`` → bad
    - density ≥ ``stopwords_low``: good if longer than ``length_high``
      and density ≥ ``stopwords_high``, else neargood

    Neighborhood pass (the revised-algorithm rule, simplified and
    documented): for each undecided block the nearest DEFINITE
    (good/bad) neighbors before and after decide — ``neargood`` becomes
    good if either side is good; ``short`` only if both are good;
    everything else becomes bad.  Returns ``(text, label)`` per block
    with final labels in document order."""
    doc = decode_html(raw)
    doc = _SCRIPT_STYLE.sub(" ", doc)
    sw = {w.lower() for w in stopwords}
    blocks: list[tuple[str, str]] = []
    for seg in _BLOCK_TAG.split(doc):
        link_chars = sum(
            len(_clean_meta(_INNER_TAG.sub("", t)))
            for t in _ANY_ANCHOR.findall(seg)
        )
        text = _clean_meta(_INNER_TAG.sub(" ", seg))
        if not text:
            continue
        words = text.split()
        stop_density = (sum(w.lower() in sw for w in words)
                        / len(words)) if words else 0.0
        link_density = link_chars / len(text)
        if link_density > max_link_density or "©" in text:
            label = "bad"
        elif len(text) < length_low:
            label = "bad" if link_chars else "short"
        elif stop_density < stopwords_low:
            label = "bad"
        elif len(text) > length_high and stop_density >= stopwords_high:
            label = "good"
        else:
            label = "neargood"
        blocks.append((text, label))

    labels = [lb for _, lb in blocks]
    definite = [lb if lb in ("good", "bad") else None for lb in labels]
    n = len(blocks)
    prev_def = ["bad"] * n
    nxt_def = ["bad"] * n
    last = "bad"
    for j in range(n):
        prev_def[j] = last
        if definite[j]:
            last = definite[j]
    last = "bad"
    for j in range(n - 1, -1, -1):
        nxt_def[j] = last
        if definite[j]:
            last = definite[j]
    final = []
    for j, (text, lb) in enumerate(blocks):
        if lb == "neargood":
            lb = ("good" if prev_def[j] == "good"
                  or nxt_def[j] == "good" else "bad")
        elif lb == "short":
            lb = ("good" if prev_def[j] == "good"
                  and nxt_def[j] == "good" else "bad")
        final.append((text, lb))
    return final


_SM_URL_BLOCK = re.compile(r"<url>(.*?)</url>", re.IGNORECASE | re.DOTALL)
_SM_NESTED = re.compile(r"<sitemap>(.*?)</sitemap>",
                        re.IGNORECASE | re.DOTALL)
_SM_LOC = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.IGNORECASE | re.DOTALL)
_SM_LASTMOD = re.compile(r"<lastmod>\s*(.*?)\s*</lastmod>",
                         re.IGNORECASE | re.DOTALL)
_SM_PRIORITY = re.compile(r"<priority>\s*(.*?)\s*</priority>",
                          re.IGNORECASE | re.DOTALL)


def parse_sitemap(raw: bytes) -> list[dict]:
    """sitemaps.org XML parsing (the crawl seed/refresh protocol):
    ``<urlset>`` entries yield ``kind="url"`` rows with ``loc``,
    optional ``lastmod`` (string, as published) and ``priority``
    (float); ``<sitemapindex>`` entries yield ``kind="sitemap"`` rows
    pointing at nested sitemaps.  Entity-unescaped locs; entries
    without a ``<loc>`` are skipped.  Compiled-regex block scan (the
    per-file findall is the irreducible parse work)."""
    doc = decode_html(raw)
    out: list[dict] = []
    for kind, block_re in (("url", _SM_URL_BLOCK),
                           ("sitemap", _SM_NESTED)):
        for block in block_re.findall(doc):
            loc = _SM_LOC.search(block)
            if not loc:
                continue
            lastmod = _SM_LASTMOD.search(block)
            prio = _SM_PRIORITY.search(block)
            try:
                prio_val = float(prio.group(1)) if prio else None
            except ValueError:
                prio_val = None
            out.append({
                "kind": kind,
                "loc": _html.unescape(loc.group(1)),
                "lastmod": lastmod.group(1) if lastmod else None,
                "priority": prio_val,
            })
    return out
