"""HTML main-content extraction (boilerplate stripping).

The reference has NO HTML loader (its EXT_TO_LOADER covers only
pdf/docx/pptx/xlsx — /root/reference/docproc/doc/loaders/factory.py:12-18),
so this kernel is built from the published Readability / Boilerpipe
heuristic family: block-level segmentation, then keep blocks by TEXT
DENSITY (enough non-markup characters) and LINK DENSITY (fraction of the
block's characters that sit inside anchors).

Deterministic, stdlib-only (html.parser), shared verbatim by the oracle and
by the Spark mapInPandas kernel so both sides produce identical spans.

Rules (fixed constants — part of this engine's invariant):
  - ignore subtrees: script, style, noscript, nav, aside, form, iframe,
    svg, head, footer, header (site chrome; an in-article <header> tag is
    rare enough that Boilerpipe-style strippers drop it too)
  - block boundaries: p, div, section, article, li, td, th, tr, h1-h6,
    blockquote, pre, br
  - a heading block (h1-h6) is kept as kind='header' if it has ≥ 3 chars
    and zero link characters
  - any other block is kept as kind='text' if it has ≥ MIN_BLOCK_CHARS
    (25) characters and link_density ≤ MAX_LINK_DENSITY (0.35)
  - a <table> in a content region collects into ONE kind='table' block:
    cells pipe-joined, rows newline-joined (the ooxml table-span
    convention); nested tables flatten into the enclosing one; the block
    then passes the same min-chars + link-density rules as text, so
    navigation/link-farm tables (the classic Boilerpipe layout-table
    signal) drop while data tables survive
  - a <pre> in a content region collects into ONE kind='code' block:
    text verbatim (line structure preserved; the sanitize stage later
    collapses space/tab runs per the reference semantics, so code keeps
    its lines but not its indentation), other block tags inside it are
    inert. Code blocks pass the link-density rule but NOT the min-chars
    rule (MIN_CODE_CHARS = 1): a two-line snippet is content even though
    a two-word text block is chrome. A <pre> inside nav/footer drops
    with its subtree; a <pre> inside a table stays table-cell text.
  - an <img> in a content region interleaves as kind='image' at the
    position its enclosing block flushes (after any text accumulated so
    far, between blocks otherwise). media_ref: data: URIs → sha256 of
    the decoded payload bytes (the engine's cross-document media
    identity, same contract as raw-bytes PPTX/PDF ingestion —
    sources/ooxml.py / sources/pdf.py); other src values → the src
    string verbatim (no bytes in hand; the URL is the stable identity).
    The img's alt attribute (whitespace-collapsed, non-empty) becomes
    the image span's TEXT — the publisher's own caption, the primary
    signal LAION-style caption mining pairs with the image. Assembly
    ignores media-span text (captions come from the provider keyed by
    media_ref), so alt never perturbs the markdown path. Tracking
    pixels (any width/height attribute ≤ TRACKER_MAX_DIM) and srcless
    imgs are dropped; chrome logos fall out with their
    nav/header/footer subtrees. Lazy-loaded imgs resolve through
    _resolve_img_src: a data-src / data-lazy-src / data-original
    attribute ALWAYS beats src (the loader swaps src — a data: pixel OR
    a shared placeholder URL — at runtime), then a real src, then the
    largest srcset / data-srcset candidate — by src alone, every lazy
    image on a page would collapse onto one placeholder identity. When the caller passes the page's URL (WARC tables
    carry one), relative srcs resolve absolute against it — refined by
    the document's first <base href> — because "/logo.png" names
    DIFFERENT images on different sites and corpus-wide media identity
    (template stripping, media dedupe, caption mining) keys on the ref.
  - a block inside <figcaption> is kept as kind='text' at a lower bar
    (MIN_CAPTION_CHARS = 3, same floor as headings; link-density rule
    unchanged): figure captions are short by nature — "Fig. 3: results"
    is content even though a 14-char prose block is chrome. It stays
    kind='text' (no new span kind): adjacency to the figure's image
    span is what caption mining keys off, and the span-kind vocabulary
    is a cross-module invariant not worth widening for a length rule.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
from html.parser import HTMLParser
from urllib.parse import unquote_to_bytes, urljoin

IGNORE_TAGS = frozenset(
    {"script", "style", "noscript", "nav", "aside", "form", "iframe", "svg",
     "head", "footer", "header"}
)
BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "li", "td", "th", "tr", "blockquote",
     "pre", "br", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "table",
     "body", "html", "main", "figure", "figcaption"}
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
VOID_TAGS = frozenset({"br", "img", "hr", "meta", "link", "input", "base"})

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.35
MIN_HEADING_CHARS = 3
MIN_CODE_CHARS = 1
MIN_CAPTION_CHARS = 3  # a <figcaption> block keeps at the heading floor
TRACKER_MAX_DIM = 2  # width/height attr at or below this = beacon pixel


def _data_uri_blob(src: str) -> bytes | None:
    """Decoded payload of a data: URI, or None when malformed."""
    try:
        head, sep, payload = src.partition(",")
        if sep == "":  # no comma: not a well-formed data URI
            raise ValueError("no payload")
        if head.rsplit(";", 1)[-1].lower() == "base64":
            return base64.b64decode(payload, validate=True)
        return unquote_to_bytes(payload)
    except (ValueError, binascii.Error):
        return None


def _media_ref_for_src(src: str) -> str:
    """Stable media identity for an <img> src.

    data: URIs carry the bytes, so identity is sha256-of-payload exactly
    like raw-bytes office/PDF ingestion; malformed payloads hash the raw
    URI text instead (still deterministic, never raises). Anything else
    is identified by the src string itself.
    """
    if not src.startswith("data:"):
        return src
    blob = _data_uri_blob(src)
    if blob is None:
        blob = src.encode("utf-8", "surrogatepass")
    return hashlib.sha256(blob).hexdigest()


_LAZY_SRC_ATTRS = ("data-src", "data-lazy-src", "data-original")


def _srcset_candidates(srcset: str) -> list[tuple[str, str]]:
    """(url, descriptor) candidates per the HTML srcset grammar's shape:
    a URL is a maximal non-whitespace run (so commas INSIDE a URL —
    Cloudinary/imgix transform segments like `/upload/w_300,c_fill/` —
    stay part of it); a URL ending in commas has no descriptor; else the
    descriptor runs to the next comma. Splitting on bare ',' shreds
    comma-bearing URLs and a mid-URL fragment becomes the identity."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(srcset)
    while i < n:
        while i < n and (srcset[i].isspace() or srcset[i] == ","):
            i += 1
        start = i
        while i < n and not srcset[i].isspace():
            i += 1
        url = srcset[start:i]
        if not url:
            break
        if url.endswith(","):
            out.append((url.rstrip(","), ""))
            continue
        dstart = i
        while i < n and srcset[i] != ",":
            i += 1
        out.append((url, srcset[dstart:i].strip()))
        i += 1  # past the separating comma
    return out


def _srcset_best(srcset: str) -> str:
    """Largest-descriptor candidate of a srcset list (`url 480w, url 2x`,
    descriptor optional). Width (`w`) and density (`x`) values compare by
    magnitude — a valid srcset never mixes the units, so the comparison
    only ever sees one kind. First candidate wins ties (strict >), so the
    pick is deterministic."""
    best_url, best_d = "", -1.0
    for url, desc in _srcset_candidates(srcset):
        d = 0.0
        desc = desc.split()[-1].lower() if desc.split() else ""
        if desc[-1:] in ("w", "x"):
            try:
                d = float(desc[:-1])
            except ValueError:
                d = 0.0
        if d > best_d:
            best_url, best_d = url, d
    return best_url


def _resolve_img_src(a: dict[str, str]) -> str:
    """The identity-bearing source of an <img>, lazy-loading aware.

    Real-web lazy loaders (lazysizes, WordPress, jQuery.lazy) park the
    payload URL in data-src / data-lazy-src / data-original (or a
    data-srcset) and point `src` at a placeholder — an inline data:
    pixel OR a shared placeholder URL (WordPress ships
    `lazy-load/images/1x1.trans.gif`) — which the loader swaps out at
    runtime. A lazy attribute therefore ALWAYS wins over src: by src
    alone every lazy image on the page collapses onto one placeholder
    identity. Then a real (non-data:) src; then the largest srcset /
    data-srcset candidate; a data: src stands only when nothing else
    does (genuine inline image, hashed by payload)."""
    src = a.get("src", "").strip()
    lazy = next(
        (a[k].strip() for k in _LAZY_SRC_ATTRS if a.get(k, "").strip()), ""
    )
    if lazy:
        return lazy
    if src and not src.startswith("data:"):
        return src
    for k in ("srcset", "data-srcset"):
        got = _srcset_best(a.get(k, ""))
        if got:
            return got
    return src  # data: payload with no alternative, or empty


class _BlockParser(HTMLParser):
    def __init__(
        self,
        base_url: str | None = None,
        media_facts: dict[str, dict] | None = None,
    ) -> None:
        # document base for resolving relative image URLs (the page's own
        # URL, e.g. the WARC-Target-URI); the first <base href> refines it
        self._base = base_url
        self._base_seen = False
        # optional media-catalogue sink (sources/media_sidecar.py): each
        # first-seen image ref records its facts — data: payloads get
        # blob size + container-header sniff, URL images keep the
        # resolved URL plus the author-DECLARED width/height attributes
        self._media_facts = media_facts
        super().__init__(convert_charrefs=True)
        # (kind, text, media_ref, link_chars)
        self.blocks: list[tuple[str, str | None, str | None, int]] = []
        self._ignore_depth = 0
        self._link_depth = 0
        self._buf: list[str] = []
        self._link_chars = 0
        self._heading: str | None = None
        # open <figcaption> depth: blocks flushed inside one carry the
        # internal kind 'figcaption' so html_main_blocks can apply the
        # caption min-chars floor (they emit as kind='text')
        self._figcap_depth = 0
        # (media_ref, alt-or-None) pairs awaiting block flush
        self._pending_imgs: list[tuple[str, str | None]] = []
        # table mode: cells/rows collected into ONE kind='table' block
        # (pipe-joined cells, newline-joined rows — the ooxml table span
        # convention); nested tables flatten into the enclosing one
        self._table_depth = 0
        self._tbl_rows: list[list[str]] = []
        self._tbl_cell: list[str] | None = None
        self._tbl_link_chars = 0
        # pre mode: data collects verbatim into _buf until the pre
        # closes, then emits ONE kind='code' block; block tags inside
        # are inert (mutually exclusive with table mode: a <pre> inside
        # a table never enters pre mode)
        self._pre_depth = 0
        # open-element stack (non-void tags) for HTML5-style implicit
        # close: an endtag closes any still-open descendants first. The
        # real-world failure this prevents: an unclosed <nav> (no </nav>
        # ever) left _ignore_depth positive FOREVER, silently discarding
        # the entire article after the menu; now the ancestor's close
        # (</body>, </div>, ...) pops it.
        self._stack: list[str] = []

    def _flush(self) -> None:
        text = "".join(self._buf).strip()
        if text:
            if self._heading:
                kind = "header"
            elif self._figcap_depth:
                kind = "figcaption"  # internal: emits as text, lower bar
            else:
                kind = "text"
            self.blocks.append((kind, text, None, self._link_chars))
        # images interleave after the text they shared a block with
        for ref, alt in self._pending_imgs:
            self.blocks.append(("image", alt, ref, 0))
        self._buf = []
        self._link_chars = 0
        self._pending_imgs = []

    def _close_cell(self) -> None:
        if self._tbl_cell is None:
            return
        cell = " ".join("".join(self._tbl_cell).split())
        self._tbl_cell = None
        if cell:
            if not self._tbl_rows:
                self._tbl_rows.append([])
            self._tbl_rows[-1].append(cell)

    def _finalize_table(self) -> None:
        """Close the collected table into one kind='table' block (caller
        manages _table_depth)."""
        self._close_cell()
        text = "\n".join(" | ".join(r) for r in self._tbl_rows if r)
        if text:
            self.blocks.append(("table", text, None, self._tbl_link_chars))
        for ref, alt in self._pending_imgs:
            self.blocks.append(("image", alt, ref, 0))
        self._pending_imgs = []
        self._tbl_rows = []
        self._tbl_link_chars = 0

    def _finalize_code(self) -> None:
        """Close the collected pre into one kind='code' block (caller
        manages _pre_depth)."""
        text = "".join(self._buf).strip()
        if text:
            self.blocks.append(("code", text, None, self._link_chars))
        for ref, alt in self._pending_imgs:
            self.blocks.append(("image", alt, ref, 0))
        self._buf = []
        self._link_chars = 0
        self._pending_imgs = []

    def _handle_img(self, attrs) -> None:
        a = {k.lower(): (v or "") for k, v in attrs}
        src = _resolve_img_src(a)
        if not src:
            return
        for dim in ("width", "height"):
            try:
                if int(a[dim].strip().rstrip("px")) <= TRACKER_MAX_DIM:
                    return  # beacon / spacer pixel
            except (KeyError, ValueError):
                pass
        if self._base and not src.startswith("data:"):
            # resolve URL identity against the document base: "/logo.png"
            # names DIFFERENT images on different sites, and the same
            # image as "/x.png" vs "https://site/x.png" must unify —
            # unresolved relative refs poison corpus-wide media identity
            # (template stripping, dedupe, caption mining all key on it)
            try:
                src = urljoin(self._base, src)
            except ValueError:
                pass  # pathological base/src: keep the raw string
        ref = _media_ref_for_src(src)
        if self._media_facts is not None and ref not in self._media_facts:
            facts: dict = {"name": src}
            blob = _data_uri_blob(src) if src.startswith("data:") else None
            if blob is not None:
                from docproc_spark.kernels.mediainfo import sniff_media_header

                facts["n_bytes"] = len(blob)
                facts.update(sniff_media_header(blob))
            else:
                # no bytes in hand (URL image): the declared width/height
                # attributes are the only dimension facts available
                for dim in ("width", "height"):
                    try:
                        facts[dim] = int(a[dim].strip().rstrip("px"))
                    except (KeyError, ValueError):
                        pass
            self._media_facts[ref] = facts
        alt = " ".join(a.get("alt", "").split()) or None
        if self._table_depth or "".join(self._buf).strip():
            # mid-block (or mid-table): emit after the enclosing block
            self._pending_imgs.append((ref, alt))
        else:
            self.blocks.append(("image", alt, ref, 0))

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag == "base" and not self._base_seen:
            # <base href> sets the document base (first one wins, HTML
            # spec); it lives in <head>, so capture BEFORE ignore gating.
            # A relative href resolves against the page URL.
            href = next(
                (v for k, v in attrs if k.lower() == "href" and v), None
            )
            if href:
                self._base = (
                    urljoin(self._base, href.strip())
                    if self._base
                    else href.strip()
                )
                self._base_seen = True
        if tag not in VOID_TAGS:
            self._stack.append(tag)
        if tag in IGNORE_TAGS:
            if tag not in VOID_TAGS:
                self._ignore_depth += 1
            return
        if self._ignore_depth:
            return
        if tag == "img":
            self._handle_img(attrs)
            return
        if tag == "a":
            self._link_depth += 1
        if self._pre_depth:
            if tag == "pre":
                self._pre_depth += 1
            return  # block boundaries are inert inside pre
        if tag == "pre" and not self._table_depth:
            self._flush()
            self._heading = None
            self._pre_depth = 1
            return
        if tag == "table":
            if self._table_depth == 0:
                self._flush()
            self._table_depth += 1
            return
        if self._table_depth:
            # inside a table only row/cell boundaries matter; other block
            # tags neither flush nor set heading state
            if tag == "tr":
                self._close_cell()
                self._tbl_rows.append([])
            elif tag in ("td", "th", "caption"):
                # caption opens a cell too: its text becomes a row of its
                # own instead of silently dropping
                self._close_cell()
                if not self._tbl_rows:
                    self._tbl_rows.append([])
                self._tbl_cell = []
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._heading = tag if tag in HEADING_TAGS else None
            if tag == "figcaption":
                self._figcap_depth += 1

    def handle_endtag(self, tag):
        tag = tag.lower()
        # implicit close: pop still-open descendants up to this tag (a
        # stray endtag with no matching open element pops nothing). On
        # well-formed HTML the tag is on top and this is a plain pop, so
        # the original semantics below are untouched. Implicitly-closed
        # descendants must ALSO release their parser state: an unclosed
        # <a> popped here previously left _link_depth raised forever
        # (every later block read as 100% link chars and was dropped),
        # and an implicitly-closed heading left _heading set (the next
        # block was misclassified as kind='header').
        if tag in self._stack:
            idx = len(self._stack) - 1 - self._stack[::-1].index(tag)
            crosses_ignore = any(
                t in IGNORE_TAGS for t in self._stack[idx + 1 :]
            )
            if crosses_ignore and tag not in IGNORE_TAGS and tag not in BLOCK_TAGS:
                # a stray INLINE endtag (</a>, </span>) whose match lies
                # below an open ignored subtree must not pop the ignore
                # tag on its way down — that leaked nav/footer chrome
                # into the content buffer. Splice the matched element out
                # in place (its own state still closes: the outer <a>
                # really did end) and leave the ignore subtree standing.
                # Structural closes (</div>, </section>) still terminate
                # an unclosed nav, matching browser recovery.
                del self._stack[idx]
                if tag == "a":
                    self._link_depth = max(0, self._link_depth - 1)
                return
            while self._stack:
                t = self._stack.pop()
                if t in IGNORE_TAGS:
                    self._ignore_depth = max(0, self._ignore_depth - 1)
                elif t == tag:
                    break  # the matching tag's own state is handled below
                elif t == "a":
                    self._link_depth = max(0, self._link_depth - 1)
                elif t == "table":
                    if self._table_depth:
                        self._table_depth -= 1
                        if self._table_depth == 0 and not self._ignore_depth:
                            self._finalize_table()
                elif t in ("td", "th", "tr", "caption") and self._table_depth:
                    self._close_cell()
                elif t == "pre":
                    if self._pre_depth:
                        self._pre_depth -= 1
                        if self._pre_depth == 0 and not self._ignore_depth:
                            self._finalize_code()
                elif (
                    t in BLOCK_TAGS
                    and not self._ignore_depth
                    and not self._table_depth
                    and not self._pre_depth
                ):
                    self._flush()
                    if self._heading == t:
                        self._heading = None
                    if t == "figcaption":
                        self._figcap_depth = max(0, self._figcap_depth - 1)
                if t == tag:
                    break
        if tag in IGNORE_TAGS and tag not in VOID_TAGS:
            # depth already adjusted by the pop above
            return
        if self._ignore_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag == "pre":
            if self._pre_depth:
                self._pre_depth -= 1
                if self._pre_depth == 0:
                    self._finalize_code()
            return
        if self._pre_depth:
            return  # other endtags are inert inside pre
        if tag == "table":
            if self._table_depth:
                self._table_depth -= 1
                if self._table_depth == 0:
                    self._finalize_table()
            return
        if self._table_depth:
            if tag in ("td", "th", "tr", "caption"):
                self._close_cell()
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in HEADING_TAGS:
                self._heading = None
            if tag == "figcaption":
                self._figcap_depth = max(0, self._figcap_depth - 1)

    def handle_data(self, data):
        if self._ignore_depth or not data:
            return
        if self._table_depth:
            # text lands in the open cell; stray text between cells (an
            # HTML parse-error zone browsers foster out) is dropped
            if self._tbl_cell is not None:
                self._tbl_cell.append(data)
                if self._link_depth:
                    self._tbl_link_chars += len(data)
            return
        self._buf.append(data)
        if self._link_depth:
            self._link_chars += len(data)

    def close(self):
        super().close()
        if self._table_depth:  # unclosed table at EOF: emit what we have
            self._table_depth = 0
            self._finalize_table()
        if self._pre_depth:  # unclosed pre at EOF: emit what we have
            self._pre_depth = 0
            self._finalize_code()
        self._flush()


def html_main_blocks(
    raw_html: str,
    base_url: str | None = None,
    media_facts: dict[str, dict] | None = None,
) -> list[tuple[str, str | None, str | None]]:
    """Extract main-content blocks from raw HTML →
    [(kind, text, media_ref), ...].

    kind ∈ {header, text, table, code, image}; order preserved; boilerplate
    (nav/footer/link farms/short chrome, beacon pixels) dropped by the
    density rules above. text carries the img's alt attribute for image
    blocks (None when absent); media_ref is None for text/header blocks.
    Blocks from <figcaption> emit as kind='text' at the caption floor.
    `base_url` (the page's own URL when known, e.g. WARC-Target-URI,
    refined by the document's first <base href>) resolves relative image
    srcs to absolute URL identities; without it refs stay verbatim.
    `media_facts` (optional dict sink) records each first-seen image
    ref's catalogue facts — data: payloads get blob size + container
    sniff, URL images the resolved URL and declared width/height — for
    sources/media_sidecar.py, sharing this one parse.
    """
    if not raw_html:
        return []
    parser = _BlockParser(base_url=base_url, media_facts=media_facts)
    try:
        parser.feed(raw_html)
        parser.close()
    except Exception:
        return []
    kept: list[tuple[str, str | None, str | None]] = []
    for kind, text, media_ref, link_chars in parser.blocks:
        if kind == "image":
            kept.append((kind, text, media_ref))
            continue
        n = len(text)
        if kind == "header":
            if n >= MIN_HEADING_CHARS and link_chars == 0:
                kept.append((kind, text, None))
            continue
        if kind == "code":
            if n >= MIN_CODE_CHARS and (link_chars / n) <= MAX_LINK_DENSITY:
                kept.append((kind, text, None))
            continue
        if kind == "figcaption":
            if n >= MIN_CAPTION_CHARS and (link_chars / n) <= MAX_LINK_DENSITY:
                kept.append(("text", text, None))
            continue
        if n >= MIN_BLOCK_CHARS and (link_chars / n) <= MAX_LINK_DENSITY:
            kept.append((kind, text, None))
    return kept
