"""PDF bytes → span-table ingestion kernel (stdlib-only, simple-PDF subset).

The reference loads PDFs through PyMuPDF (`/root/reference/docproc/doc/
loaders/pdf_loader.py:17-54`): page.get_text("blocks") → (x0,y0,x1,y1,text)
tuples, blank blocks dropped, block order kept. PyMuPDF is not in this
environment, so this module parses the bytes directly with zlib + regex and
feeds the SAME block shape into kernels/pdf_layout.blocks_to_spans — the
ordering/classification kernel both paths already share.

Supported subset (documented contract — anything outside it quarantines
with a parse_error instead of failing the job):

  - objects located by scanning `N 0 obj … endobj` (no xref parsing —
    tolerant of linearized/appended files), then /Type /ObjStm object
    streams expanded inline (PDF 1.5+ compressed objects, the
    modern-writer default; the /XRef stream itself never needs
    decoding — see _expand_object_streams)
  - encrypted PDFs with an EMPTY user password (owner-password-only
    print/copy restrictions — the common web case, which every viewer
    and the reference via PyMuPDF opens without prompting) decrypt
    transparently: standard security handler R=2/3/4 (RC4-40..128,
    AES-128 /AESV2) and R=5/6 (AES-256 /AESV3, PDF 2.0) via
    kernels/pdfcrypt; stream payloads are decrypted in place before
    ObjStm expansion (object streams are themselves encrypted).
    Dict-level STRINGS stay ciphertext — span extraction reads only
    stream content, and /O //U themselves are spec-plaintext. Files
    that genuinely need a user password, or use a non-Standard
    security handler, quarantine with a precise reason
  - page order from the /Catalog → /Pages → /Kids tree (recursive,
    cycle/depth-bounded)
  - stream filters: /FlateDecode, /LZWDecode (9→12-bit, EarlyChange),
    /ASCIIHexDecode, /ASCII85Decode, /RunLengthDecode — singly or as a
    /Filter array chain, with /DecodeParms PNG predictors 10-15 and
    8-bit TIFF differencing on Flate/LZW output; lossy image codecs
    (DCT/JPX/CCITT/JBIG2) terminate the chain and the bytes in hand are
    the image's content identity; unknown filters (e.g. /Crypt) stop
    the chain tolerantly
  - text: BT…ET blocks; Tm/Td/TD/T* positioning (a new line per
    line-move, joined "\\n"); Tj / ' / TJ show ops — a TJ kerning
    adjustment ≤ TJ_SPACE_KERN reads as a word space (justified text
    often encodes spaces as pen movement, never a glyph); literal ( ) strings
    with escapes + octal, and <hex> strings; Latin-1 byte decoding by
    default, a 1-byte /Encoding decoder (WinAnsi/MacRoman BaseEncoding
    + /Differences glyph names through an AGL subset incl. uniXXXX)
    for simple fonts that declare one, or the active font's /ToUnicode
    CMap (Tf-switched; 1- and
    2-byte codes, bfchar + both bfrange forms) for composite/CID text
  - one block per BT…ET group, bbox from the text origin (PDF y-up
    flipped to top-down so (y0, x0) reading order matches pdf_layout)
  - images: /XObject /Subtype /Image resources invoked with `name Do`
    emit an ``image`` span whose media_ref is the sha256 of the decoded
    image stream (content-addressed identity, vision_llm.py:292-294;
    streamless objects fall back to the resource name), ordered at the
    position of the current transform's translate
  - inline images (BI…ID…EI) are lifted out of the content stream
    before tokenization and emit the same image spans under the same
    sha256-of-decoded-payload identity (/F//DP filter chains honored
    via the shared decoder, abbreviated names included;
    payload end = /L when present, else the first whitespace-delimited
    EI — the documented subset ambiguity /L exists to remove)
  - /Subtype /Form XObjects (running headers, watermarks, letterhead)
    splice their streams at the `name Do` site (visited-set + depth-8
    bound; /Matrix ignored — translate-only geometry); form-local
    images/fonts merge flat with page bindings winning on collision

Full-text parity: page texts joined "\\n\\n" with empty pages INCLUDED
(pdf_loader.get_full_text, :56-61) is exactly operators/fulltext.
full_text_pdf over the emitted spans.

Spark shape: ``load_pdf`` is one ``mapInPandas`` pass (Arrow-batched,
per-document CPU work, no shuffle), same contract as sources/ooxml.
"""

from __future__ import annotations

import base64
import hashlib
import re
import zlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame

from docproc_spark.kernels.pdf_layout import blocks_to_spans
from docproc_spark.sources.ooxml import OOXML_OUT_SCHEMA

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)

# A TJ numeric adjustment at or below this (thousandths of an em;
# negative moves the pen right) reads as an encoded word space — the
# threshold pdfminer ships as its word-gap margin (~0.18 em; a typical
# space glyph is 0.25 em).
TJ_SPACE_KERN = -180.0


def _objects(data: bytes) -> dict[int, bytes]:
    # Collision rule without xref parsing: LATEST file position wins.
    # Incremental updates APPEND their replacement objects — whether
    # uncompressed at top level or inside a newer ObjStm — so the byte
    # offset of a definition (members inherit their container's offset)
    # is the update recency the xref table would otherwise encode.
    objs: dict[int, bytes] = {}
    pos: dict[int, int] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        objs[num] = m.group(2)
        pos[num] = m.start()
    enc_num = _encrypt_obj_num(data, objs)
    if enc_num is not None:
        # decrypt BEFORE ObjStm expansion: the containers are encrypted
        # as ordinary streams, their members are not re-encrypted
        _decrypt_streams(data, objs, enc_num)
    _expand_object_streams(objs, pos)
    return objs


def _expand_object_streams(objs: dict[int, bytes], pos: dict[int, int]) -> None:
    """Inline the members of /Type /ObjStm object streams (PDF 1.5+).

    Modern writers put the catalog / pages tree / font dicts inside
    compressed object streams — the cross-reference is an /XRef stream
    and NO `N 0 obj` wrapper exists for the members, so the raw object
    scan alone sees an empty document. The stream layout (ISO 32000
    §7.5.7): /N pairs of `objnum offset` ints, then the concatenated
    object bodies starting at /First; offsets are relative to /First.
    Members never carry streams themselves, so the body slice is
    complete. Collisions resolve by FILE POSITION (see _objects): a
    member inherits its container's offset, so an appended-update ObjStm
    overrides the base file's copy, while a replacement object appended
    uncompressed after the ObjStm overrides the member.

    No xref parsing is needed at all — the scan finds the ObjStm
    containers, this expands them, and the /Catalog walk does the rest
    (the /XRef stream object itself is just never referenced)."""
    containers = sorted(
        (n for n in objs if re.search(rb"/Type\s*/ObjStm", objs[n])),
        key=lambda n: pos.get(n, -1),
    )
    for num in containers:
        body = objs[num]
        n_m = re.search(rb"/N\s+(\d+)", body)
        first_m = re.search(rb"/First\s+(\d+)", body)
        if not (n_m and first_m):
            continue
        data = _stream_bytes(objs, num)
        first = int(first_m.group(1))
        if not data or first > len(data):
            continue
        try:
            head = [int(t) for t in data[:first].split()]
        except ValueError:
            continue
        cpos = pos.get(num, -1)
        pairs = list(zip(head[0::2], head[1::2]))[: int(n_m.group(1))]
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(data) - first
            if 0 <= off <= end and pos.get(onum, -1) < cpos:
                objs[onum] = data[first + off : first + end]
                pos[onum] = cpos


def _dict_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+0\s+R", body)
    return int(m.group(1)) if m else None


def _kids(body: bytes) -> list[int]:
    m = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
    if not m:
        return []
    return [int(r) for r in re.findall(rb"(\d+)\s+0\s+R", m.group(1))]


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in document order via the /Pages tree; falls
    back to ascending object number for files without a proper tree."""
    root_pages = None
    for body in objs.values():
        if b"/Type" in body and b"/Catalog" in body:
            root_pages = _dict_ref(body, b"Pages")
            break
    order: list[int] = []
    seen: set[int] = set()

    def walk(num: int, depth: int = 0) -> None:
        # A corrupt/malicious /Pages tree can be cyclic or arbitrarily
        # deep; skip already-visited nodes and bound depth so we never
        # burn the interpreter stack to RecursionError per document.
        if num in seen or depth > 64:
            return
        seen.add(num)
        body = objs.get(num)
        if body is None:
            return
        if b"/Type" in body and b"/Page" in body and b"/Pages" not in body:
            order.append(num)
            return
        for kid in _kids(body):
            walk(kid, depth + 1)

    if root_pages is not None:
        walk(root_pages)
    if not order:
        order = sorted(
            n
            for n, b in objs.items()
            if b"/Type" in b and re.search(rb"/Type\s*/Page\b", b)
        )
    return order


def _media_box(objs: dict[int, bytes], page_body: bytes) -> tuple[float, float]:
    """(width, height); inherited from the parent chain when absent."""
    body: bytes | None = page_body
    for _ in range(16):  # bounded parent walk
        if body is None:
            break
        m = re.search(rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)", body)
        if m:
            x0, y0, x1, y1 = (float(m.group(i)) for i in range(1, 5))
            return x1 - x0, y1 - y0
        parent = _dict_ref(body, b"Parent")
        body = objs.get(parent) if parent is not None else None
    return 612.0, 792.0  # US Letter default


# ---------------------------------------------------------------- filters
# The stream-filter chain (ISO 32000 §7.4). One decoder serves regular
# stream objects AND inline images (which spell the keys /F and /DP).
# Lossy image codecs are TERMINAL: the chain stops there and the bytes in
# hand become the content identity (a /FlateDecode-wrapped /DCTDecode
# image hashes its JPEG bytes — decoding the codec itself needs PIL,
# which this environment lacks and identity doesn't need).

_FILTER_ABBREV = {  # inline-image short names (§8.9.7 Table 92)
    b"Fl": b"FlateDecode",
    b"AHx": b"ASCIIHexDecode",
    b"A85": b"ASCII85Decode",
    b"RL": b"RunLengthDecode",
    b"LZW": b"LZWDecode",
    b"DCT": b"DCTDecode",
    b"CCF": b"CCITTFaxDecode",
}
_TERMINAL_FILTERS = frozenset(
    {b"DCTDecode", b"JPXDecode", b"CCITTFaxDecode", b"JBIG2Decode"}
)


def _balanced(src: bytes, start: int, opener: bytes, closer: bytes) -> int:
    """End index (exclusive) of the balanced group opening at `start`,
    or -1 if unterminated."""
    depth, i, n = 0, start, len(src)
    while i < n:
        if src.startswith(opener, i):
            depth += 1
            i += len(opener)
        elif src.startswith(closer, i):
            depth -= 1
            i += len(closer)
            if depth == 0:
                return i
        else:
            i += 1
    return -1


def _parms_items(arr: bytes) -> list[bytes]:
    """Top-level items of a /DecodeParms array body: `null` → b"",
    `<<…>>` → the dict bytes (nesting-aware)."""
    items: list[bytes] = []
    i, n = 0, len(arr)
    while i < n:
        if arr.startswith(b"<<", i):
            j = _balanced(arr, i, b"<<", b">>")
            if j < 0:
                break
            items.append(arr[i:j])
            i = j
        elif arr.startswith(b"null", i):
            items.append(b"")
            i += 4
        else:
            i += 1
    return items


def _stream_filters(body: bytes, inline: bool = False) -> list[tuple[bytes, bytes]]:
    """(filter name, decode-parms dict bytes) chain from a stream dict.

    /Filter is a name or an array of names; /DecodeParms a dict, an array
    of dict-or-null parallel to the filter array, or absent. Inline
    images use the abbreviations /F and /DP (and short filter names) —
    outside inline dicts /F is a file spec, so the short keys only apply
    when `inline`."""
    fkey = rb"/(?:Filter|F)(?![A-Za-z])" if inline else rb"/Filter(?![A-Za-z])"
    fm = re.search(fkey + rb"\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", body)
    if not fm:
        return []
    names = [
        _FILTER_ABBREV.get(n, n)
        for n in re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
    ]
    pkey = (
        rb"/(?:DecodeParms|DP)(?![A-Za-z])"
        if inline
        else rb"/DecodeParms(?![A-Za-z])"
    )
    parms: list[bytes] = []
    pm = re.search(pkey + rb"\s*", body)
    if pm:
        at = pm.end()
        if body.startswith(b"[", at):
            j = _balanced(body, at, b"[", b"]")
            if j > 0:
                parms = _parms_items(body[at + 1 : j - 1])
        elif body.startswith(b"<<", at):
            j = _balanced(body, at, b"<<", b">>")
            if j > 0:
                parms = [body[at:j]]
    parms += [b""] * (len(names) - len(parms))
    return list(zip(names, parms))


def _int_key(parms: bytes, key: bytes, default: int) -> int:
    m = re.search(rb"/" + key + rb"\s+(\d+)", parms)
    return int(m.group(1)) if m else default


def _ascii_hex_decode(data: bytes) -> bytes:
    h = b"".join(data.split(b">")[0].split())
    if len(h) % 2:
        h += b"0"  # odd count: final digit 0-padded (§7.4.2)
    return bytes.fromhex(h.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    data = data.split(b"~>")[0]
    if data.startswith(b"<~"):
        data = data[2:]
    return base64.a85decode(b"".join(data.split()))


def _rl_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:  # EOD
            break
        if length < 128:
            out += data[i : i + length + 1]
            i += length + 1
        else:
            out += data[i : i + 1] * (257 - length)
            i += 1
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode (§7.4.4) — delegates to the shared MSB-first LZW
    in kernels/imagepix (the same algorithm serves TIFF compression 5;
    see lzw_decode_msb for the EarlyChange width convention)."""
    from docproc_spark.kernels.imagepix import lzw_decode_msb

    return lzw_decode_msb(data, early)


def _unpredict(data: bytes, parms: bytes) -> bytes:
    """Undo the /Predictor pre-filter on Flate/LZW output: PNG row
    predictors 10-15 (tag byte per row) or TIFF horizontal differencing
    (predictor 2, 8-bit subset).

    Deliberate trade-off: this per-byte Python loop also runs on image
    XObject streams whose only consumer is the sha256 identity hash.
    Undoing the predictor canonicalizes the pixels, so the same image
    stored under different predictor settings still unifies — identity
    correctness over the (rare in this subset) multi-MB predictor'd
    image cost."""
    pred = _int_key(parms, b"Predictor", 1)
    if pred < 2:
        return data
    colors = _int_key(parms, b"Colors", 1)
    bpc = _int_key(parms, b"BitsPerComponent", 8)
    columns = _int_key(parms, b"Columns", 1)
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if pred == 2:
        if bpc != 8:
            return data  # sub-byte TIFF differencing: out of subset
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(r + bpp, r + rowlen):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    # per-row inversion shared with the PNG decoder (ONE implementation
    # of the five-filter math, numpy-fast Sub/Up); tags outside 1-4 are
    # tolerated as no-ops here — predictor'd streams in the wild carry
    # garbage tags and the only consumer may be the identity hash
    from docproc_spark.kernels.imagepix import unfilter_scanline

    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i < len(data):
        tag = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + rowlen
        if len(row) < rowlen:
            row.extend(bytes(rowlen - len(row)))
        if 1 <= tag <= 4:
            unfilter_scanline(tag, row, prev, bpp)
        out += row
        prev = row
    return bytes(out)


def _decode_stream(dict_src: bytes, raw: bytes, inline: bool = False) -> bytes | None:
    """Run `raw` through the /Filter chain declared in `dict_src`.

    Terminal lossy codecs (DCT/JPX/CCITT/JBIG2) stop the chain — the
    bytes in hand are the content identity. An unknown filter (e.g.
    /Crypt) also stops the chain, preserving the previous tolerant
    behavior. Returns None when a KNOWN decoder fails on its input
    (corrupt stream) — callers decide between quarantine-empty
    (_stream_bytes) and raw-bytes identity (inline images)."""
    data = raw
    for name, parms in _stream_filters(dict_src, inline):
        if name in _TERMINAL_FILTERS:
            break
        try:
            if name == b"FlateDecode":
                data = zlib.decompress(data)
            elif name == b"LZWDecode":
                data = _lzw_decode(data, _int_key(parms, b"EarlyChange", 1))
            elif name == b"ASCIIHexDecode":
                data = _ascii_hex_decode(data)
            elif name == b"ASCII85Decode":
                data = _ascii85_decode(data)
            elif name == b"RunLengthDecode":
                data = _rl_decode(data)
            else:
                break
            if name in (b"FlateDecode", b"LZWDecode") and parms:
                data = _unpredict(data, parms)
        except Exception:
            return None
    return data


def _stream_bytes(objs: dict[int, bytes], num: int) -> bytes:
    body = objs.get(num, b"")
    m = _STREAM_RE.search(body)
    if not m:
        return b""
    # filters parse from the DICT part only — a binary payload that
    # happens to contain '/Filter /…' bytes must not trigger a spurious
    # decode (which would fail and quarantine real content to b"")
    decoded = _decode_stream(body[: m.start()], m.group(1))
    return decoded if decoded is not None else b""


def _content_streams(objs: dict[int, bytes], page_body: bytes) -> bytes:
    one = _dict_ref(page_body, b"Contents")
    if one is not None:
        return _stream_bytes(objs, one)
    m = re.search(rb"/Contents\s*\[(.*?)\]", page_body, re.S)
    if m:
        parts = [
            _stream_bytes(objs, int(r))
            for r in re.findall(rb"(\d+)\s+0\s+R", m.group(1))
        ]
        return b"\n".join(parts)
    return b""


def _resources_body(objs: dict[int, bytes], page_body: bytes) -> bytes:
    """The body holding this page's /Resources entries — inline dict
    (returns the page body itself: the name dicts are searched by key),
    indirect `/Resources N 0 R`, or inherited from the /Parent chain."""
    body: bytes | None = page_body
    for _ in range(16):  # bounded parent walk
        if body is None:
            break
        m = re.search(rb"/Resources\s+(\d+)\s+0\s+R", body)
        if m:
            return objs.get(int(m.group(1)), b"")
        if re.search(rb"/Resources\s*<<", body):
            return body
        parent = _dict_ref(body, b"Parent")
        body = objs.get(parent) if parent is not None else None
    return page_body


# ------------------------------------------------------- font encodings
# Simple-font /Encoding support: a 1-byte decoder synthesized from the
# /BaseEncoding (WinAnsi → cp1252, MacRoman → mac_roman, else Latin-1)
# overridden by /Differences glyph names. Glyph names resolve through a
# compact Adobe Glyph List subset (ASCII + Latin-1 + the cp1252
# punctuation/ligature block) plus the algorithmic uniXXXX / uXXXX(XX)
# forms — the set TeX and office writers actually emit. /ToUnicode wins
# when both exist (it IS the text-extraction mapping, §9.10.2).

_AGL_ASCII = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26, "quotesingle": 0x27,
    "parenleft": 0x28, "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "zero": 0x30, "one": 0x31, "two": 0x32, "three": 0x33, "four": 0x34,
    "five": 0x35, "six": 0x36, "seven": 0x37, "eight": 0x38, "nine": 0x39,
    "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
    "greater": 0x3E, "question": 0x3F, "at": 0x40,
    "bracketleft": 0x5B, "backslash": 0x5C, "bracketright": 0x5D,
    "asciicircum": 0x5E, "underscore": 0x5F, "grave": 0x60,
    "braceleft": 0x7B, "bar": 0x7C, "braceright": 0x7D, "asciitilde": 0x7E,
}

# Latin-1 0xA1..0xFF glyph names in codepoint order ("-" = no AGL name)
_LATIN1_NAMES = (
    "exclamdown cent sterling currency yen brokenbar section dieresis "
    "copyright ordfeminine guillemotleft logicalnot - registered macron "
    "degree plusminus twosuperior threesuperior acute mu paragraph "
    "periodcentered cedilla onesuperior ordmasculine guillemotright "
    "onequarter onehalf threequarters questiondown "
    "Agrave Aacute Acircumflex Atilde Adieresis Aring AE Ccedilla "
    "Egrave Eacute Ecircumflex Edieresis Igrave Iacute Icircumflex Idieresis "
    "Eth Ntilde Ograve Oacute Ocircumflex Otilde Odieresis multiply Oslash "
    "Ugrave Uacute Ucircumflex Udieresis Yacute Thorn germandbls "
    "agrave aacute acircumflex atilde adieresis aring ae ccedilla "
    "egrave eacute ecircumflex edieresis igrave iacute icircumflex idieresis "
    "eth ntilde ograve oacute ocircumflex otilde odieresis divide oslash "
    "ugrave uacute ucircumflex udieresis yacute thorn ydieresis"
).split()

_AGL_EXTRA = {
    "Euro": "€", "quotesinglbase": "‚", "florin": "ƒ",
    "quotedblbase": "„", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "circumflex": "ˆ", "perthousand": "‰",
    "Scaron": "Š", "guilsinglleft": "‹", "OE": "Œ",
    "Zcaron": "Ž", "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”", "bullet": "•",
    "endash": "–", "emdash": "—", "tilde": "˜",
    "trademark": "™", "scaron": "š", "guilsinglright": "›",
    "oe": "œ", "zcaron": "ž", "Ydieresis": "Ÿ",
    "fi": "ﬁ", "fl": "ﬂ", "fraction": "⁄", "minus": "−",
    "dotlessi": "ı", "ring": "˚", "breve": "˘",
    "caron": "ˇ", "dotaccent": "˙", "hungarumlaut": "˝",
    "ogonek": "˛", "nbspace": " ",
}

_AGL: dict[str, str] = {n: chr(c) for n, c in _AGL_ASCII.items()}
_AGL.update(
    {n: chr(0xA1 + i) for i, n in enumerate(_LATIN1_NAMES) if n != "-"}
)
_AGL.update(_AGL_EXTRA)


def _glyph_to_unicode(name: str) -> str | None:
    if name in _AGL:
        return _AGL[name]
    if re.fullmatch(r"uni[0-9A-Fa-f]{4}", name):
        return chr(int(name[3:], 16))
    if re.fullmatch(r"u[0-9A-Fa-f]{4,6}", name):
        cp = int(name[1:], 16)
        return chr(cp) if cp <= 0x10FFFF else None
    if len(name) == 1:  # single-char names ARE their character (A-Z, a-z)
        return name
    return None


_BASE_ENC_CACHE: dict[bytes, dict[int, str]] = {}


def _base_encoding_map(name: bytes) -> dict[int, str]:
    if name not in _BASE_ENC_CACHE:
        codec = {
            b"WinAnsiEncoding": "cp1252",
            b"MacRomanEncoding": "mac_roman",
        }.get(name)
        if codec is None:  # Standard/absent: Latin-1, the parser default
            mapping = {i: chr(i) for i in range(256)}
        else:
            mapping = {}
            for i in range(256):
                try:
                    mapping[i] = bytes([i]).decode(codec)
                except UnicodeDecodeError:
                    pass  # undefined slot → unmapped → U+FFFD
        _BASE_ENC_CACHE[name] = mapping
    return _BASE_ENC_CACHE[name]


def _font_encoding(
    objs: dict[int, bytes], fbody: bytes
) -> tuple[int, dict[int, str]] | None:
    """1-byte decoder from a simple font's /Encoding entry, or None when
    the font has no usable encoding (Latin-1 default applies)."""
    enc_src = None
    m = re.search(rb"/Encoding\s+(\d+)\s+0\s+R", fbody)
    if m:
        enc_src = objs.get(int(m.group(1)), b"")
    else:
        m2 = re.search(rb"/Encoding\s*(/[A-Za-z0-9-]+|<<)", fbody)
        if not m2:
            return None
        if m2.group(1) != b"<<":
            name = m2.group(1)[1:]
            if name in (b"WinAnsiEncoding", b"MacRomanEncoding"):
                return (1, dict(_base_encoding_map(name)))
            return None  # Identity-H etc.: not a simple-font encoding
        j = _balanced(fbody, m2.start(1), b"<<", b">>")
        enc_src = fbody[m2.start(1) : j] if j > 0 else fbody[m2.start(1) :]
    base_m = re.search(rb"/BaseEncoding\s*/([A-Za-z0-9]+)", enc_src)
    dm = re.search(rb"/Differences\s*\[", enc_src)
    if base_m is None and dm is None:
        return None
    mapping = dict(_base_encoding_map(base_m.group(1) if base_m else b""))
    if dm:
        end = _balanced(enc_src, dm.end() - 1, b"[", b"]")
        arr = enc_src[dm.end() : (end - 1 if end > 0 else len(enc_src))]
        code = 0
        for nm, numt in re.findall(
            rb"/(" + _NAME_BODY + rb")|([-+]?\d+)", arr
        ):
            if numt:
                code = int(numt)
                continue
            u = _glyph_to_unicode(nm.decode("latin-1"))
            if u is not None:
                mapping[code] = u
            else:
                mapping.pop(code, None)  # unknown glyph → U+FFFD
            code += 1
    return (1, mapping)


def _parse_tounicode(stream: bytes) -> tuple[int, dict[int, str]]:
    """/ToUnicode CMap → (code byte-width, code→str map).

    Supports the subset real writers emit (ISO 32000 §9.10.3):
    codespacerange (fixes the code width, 1 or 2 bytes), bfchar pairs,
    and bfrange in both forms — incrementing destination `<lo> <hi>
    <dst>` and explicit array `<lo> <hi> [<d1> <d2> …]`. Destinations
    are UTF-16BE hex."""

    def uni(hx: bytes) -> str:
        if len(hx) % 2:  # odd-digit hex: pad like _string_bytes, don't
            hx += b"0"   # quarantine the whole document for one entry
        return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be", "replace")

    width = 1
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", stream, re.S)
    if m:
        lows = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1))
        if lows:
            width = max(1, min(2, len(lows[0]) // 2))
    mapping: dict[int, str] = {}
    for seg in re.findall(rb"beginbfchar(.*?)endbfchar", stream, re.S):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", seg
        ):
            mapping[int(src, 16)] = uni(dst)
    for seg in re.findall(rb"beginbfrange(.*?)endbfrange", stream, re.S):
        for lo, hi, rest in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
            seg,
        ):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if rest.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", rest)
                for k, d in enumerate(dsts):
                    if lo_i + k <= hi_i:
                        mapping[lo_i + k] = uni(d)
            else:
                # incrementing form: decode the WHOLE destination as
                # UTF-16BE (surrogate pairs collapse to one code point —
                # <D83DDE00> IS 😀), then add k to the final code point.
                # A step landing in the surrogate range D800-DFFF would
                # make an unencodable Python string that crashes Arrow
                # serialization OUTSIDE the per-doc quarantine — clamp
                # those to U+FFFD.
                base_str = uni(rest[1:-1]) or "�"
                last = ord(base_str[-1])
                for k in range(hi_i - lo_i + 1):
                    cp = last + k
                    ch = (
                        "�"
                        if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF
                        else chr(cp)
                    )
                    mapping[lo_i + k] = base_str[:-1] + ch
    return width, mapping


def _named_dict(objs: dict[int, bytes], src: bytes, key: bytes) -> bytes:
    """The body of `/key << … >>` (balanced — a non-greedy regex stops at
    the first nested `>>` and loses every later entry) or `/key N 0 R`
    resolved; b"" when absent."""
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+0\s+R", src)
    if m:
        inner = objs.get(int(m.group(1)), b"")
        # the referenced object is the dict itself: strip one << >> shell
        s = re.search(rb"<<(.*)>>", inner, re.S)
        return s.group(1) if s else inner
    m = re.search(rb"/" + key + rb"\s*(?=<<)", src)
    if not m:
        return b""
    j = _balanced(src, m.end(), b"<<", b">>")
    # balanced → strip the << >> shell; unterminated → everything after
    return src[m.end() + 2 : j - 2] if j > 0 else src[m.end() + 2 :]


# PDF name chars: anything but whitespace and delimiters ()<>[]{}/%
# (ISO 32000 §7.3.5) — `/TT1-Bold` is ONE name, not `/TT1` + `-Bold`
_NAME_BODY = rb"[^\s()<>\[\]{}/%]+"


def _font_cmaps(
    objs: dict[int, bytes],
    page_body: bytes,
    cache: dict[int, tuple[int, dict[int, str]]] | None = None,
) -> dict[bytes, tuple[int, dict[int, str]]]:
    """Font resource name (as the `/F1` token) → string decoder: the
    parsed /ToUnicode CMap when the font carries one, else a 1-byte
    /Encoding decoder (BaseEncoding + Differences, _font_encoding).
    Fonts with neither keep the Latin-1 byte decoding. `cache` memoizes
    parsed CMaps per ToUnicode OBJECT NUMBER across the document's pages
    (a 1000-page CJK doc shares one 50k-entry CMap — decompress + parse
    it once, not per page)."""
    fdict = _named_dict(objs, _resources_body(objs, page_body), b"Font")
    if not fdict:
        return {}
    cache = cache if cache is not None else {}
    out: dict[bytes, tuple[int, dict[int, str]]] = {}
    for name, ref in re.findall(
        rb"/(" + _NAME_BODY + rb")\s+(\d+)\s+0\s+R", fdict
    ):
        fbody = objs.get(int(ref), b"")
        tu = _dict_ref(fbody, b"ToUnicode")
        if tu is None:
            # no ToUnicode: an /Encoding (BaseEncoding + Differences)
            # still yields a 1-byte decoder; -int(ref) keys the memo so
            # font and ToUnicode object numbers can't collide
            if -int(ref) not in cache:
                enc = _font_encoding(objs, fbody)
                if enc is None:
                    continue
                cache[-int(ref)] = enc
            out[b"/" + name] = cache[-int(ref)]
            continue
        if tu not in cache:
            stream = _stream_bytes(objs, tu)
            if not stream:
                continue
            cache[tu] = _parse_tounicode(stream)
        out[b"/" + name] = cache[tu]
    return out


_IMAGE_CODEC_FORMATS = {  # terminal codec → container format of the bytes
    b"DCTDecode": "jpeg",
    b"JPXDecode": "jp2",
    b"CCITTFaxDecode": "ccitt",
    b"JBIG2Decode": "jbig2",
}


def _image_blob_format(chain: list[tuple[bytes, bytes]]) -> str:
    """What the identity bytes of an image stream ARE: the terminal
    codec's container (DCT payloads are literal JPEG files) or, with no
    terminal codec, decoded raw samples — dims then come from the image
    dict, never from byte sniffing."""
    for name, _ in chain:
        if name in _IMAGE_CODEC_FORMATS:
            return _IMAGE_CODEC_FORMATS[name]
    return "raw"


def _image_facts(
    head: bytes, name: bytes, n_bytes: int | None, inline: bool = False
) -> dict:
    """Sidecar facts for one image stream from its DICT alone — /Width
    and /Height are authoritative per ISO 32000 §8.9.5 (abbreviated /W
    /H inside inline dicts), so no codec is ever needed."""
    wkey = rb"/(?:Width|W)(?![A-Za-z])" if inline else rb"/Width(?![A-Za-z])"
    hkey = rb"/(?:Height|H)(?![A-Za-z])" if inline else rb"/Height(?![A-Za-z])"
    wm = re.search(wkey + rb"\s+(\d+)", head)
    hm = re.search(hkey + rb"\s+(\d+)", head)
    return {
        "name": name.decode("latin-1"),
        "n_bytes": n_bytes,
        "format": _image_blob_format(_stream_filters(head, inline=inline)),
        "media_kind": "image",
        "width": int(wm.group(1)) if wm else None,
        "height": int(hm.group(1)) if hm else None,
    }


_CS_SIMPLE = {
    b"DeviceRGB": "rgb",
    b"CalRGB": "rgb",
    b"DeviceGray": "gray",
    b"CalGray": "gray",
}


def iter_image_blobs(data: bytes) -> list[tuple[str, bytes, dict]]:
    """Every distinct /Subtype /Image XObject in the file as
    (media_ref, blob, info): blob is the DECODED stream — the same
    bytes span ingestion hashes, so sha256(blob) == the span table's
    and sidecar catalogue's media_ref — and info carries what a
    containerless raster decode needs (dict /Width /Height
    /BitsPerComponent, simple color space, 'format' of the identity
    bytes: 'jpeg' for kept DCT payloads, 'raw' for fully-undone filter
    chains, per _image_blob_format).

    File-level object walk, no page machinery: the perceptual-signature
    catalogue wants every embedded image whether shown or not;
    first_page / n_refs context joins from the sidecar on the shared
    sha256 identity (reference identity: vision_llm.py:292-294).
    """
    objs = _objects(data)
    seen: set[str] = set()
    out: list[tuple[str, bytes, dict]] = []
    for num in sorted(objs):
        body = objs[num]
        m = _STREAM_RE.search(body)
        if not m:
            continue
        head = body[: m.start()]
        if not re.search(rb"/Subtype\s*/Image", head):
            continue
        blob = _stream_bytes(objs, num)
        if not blob:
            continue
        ref = hashlib.sha256(blob).hexdigest()
        if ref in seen:
            continue
        seen.add(ref)
        wm = re.search(rb"/Width(?![A-Za-z])\s+(\d+)", head)
        hm = re.search(rb"/Height(?![A-Za-z])\s+(\d+)", head)
        bm = re.search(rb"/BitsPerComponent(?![A-Za-z])\s+(\d+)", head)
        cs = re.search(rb"/ColorSpace\s*/([A-Za-z0-9]+)", head)
        mask = re.search(rb"/ImageMask(?![A-Za-z])\s+true", head)
        color = _CS_SIMPLE.get(cs.group(1)) if cs else None
        if color is None and mask:
            color = "gray"  # stencil mask: 1-bit, no color space entry
        out.append(
            (
                ref,
                blob,
                {
                    "name": f"obj{num}",
                    "width": int(wm.group(1)) if wm else None,
                    "height": int(hm.group(1)) if hm else None,
                    "bpc": int(bm.group(1)) if bm else (1 if mask else 8),
                    "color": color
                    or (cs.group(1).decode("latin-1") if cs else "unknown"),
                    "format": _image_blob_format(_stream_filters(head)),
                },
            )
        )
    return out


def _image_xobjects(
    objs: dict[int, bytes],
    page_body: bytes,
    cache: dict[int, str] | None = None,
    facts: dict[str, dict] | None = None,
) -> dict[bytes, str]:
    """Resource name → media_ref for /Subtype /Image XObjects on this page.

    media_ref is the sha256 hex of the image's decoded stream bytes (the
    span contract / reference vision_llm.py:292-294 identity) — resource
    names like ``Im1`` are page-scoped and collide across documents, so
    they cannot serve as corpus-wide media identity. A streamless image
    object falls back to its resource name. `cache` memoizes the hash per
    XObject number across pages (a per-page logo is hashed once). When
    `facts` is given, each first-seen ref also records its sidecar facts
    (media_sidecar.py) — blob size plus the dict's authoritative
    /Width /Height — keyed by media_ref."""
    xdict = _named_dict(objs, _resources_body(objs, page_body), b"XObject")
    if not xdict:
        return {}
    cache = cache if cache is not None else {}
    refs: dict[bytes, str] = {}
    for name, ref in re.findall(
        rb"/(" + _NAME_BODY + rb")\s+(\d+)\s+0\s+R", xdict
    ):
        onum = int(ref)
        tgt = objs.get(onum, b"")
        if not re.search(rb"/Subtype\s*/Image", tgt):
            continue
        if onum not in cache:
            stream = _stream_bytes(objs, onum)
            cache[onum] = (
                hashlib.sha256(stream).hexdigest()
                if stream
                else name.decode("latin-1")
            )
            if facts is not None and cache[onum] not in facts:
                m = _STREAM_RE.search(tgt)
                facts[cache[onum]] = _image_facts(
                    tgt[: m.start()] if m else tgt,
                    name,
                    len(stream) if stream else None,
                )
        refs[name] = cache[onum]
    return refs


def _form_xobjects(objs: dict[int, bytes], body: bytes) -> dict[bytes, int]:
    """Resource name → object number for /Subtype /Form XObjects reachable
    from this body's /Resources (page or form — forms carry their own)."""
    xdict = _named_dict(objs, _resources_body(objs, body), b"XObject")
    forms: dict[bytes, int] = {}
    for name, ref in re.findall(
        rb"/(" + _NAME_BODY + rb")\s+(\d+)\s+0\s+R", xdict
    ):
        if re.search(rb"/Subtype\s*/Form", objs.get(int(ref), b"")):
            forms[name] = int(ref)
    return forms


_DO_RE = re.compile(rb"/(" + _NAME_BODY + rb")\s+Do(?![0-9A-Za-z])")


def _expand_forms(
    objs: dict[int, bytes],
    content: bytes,
    forms: dict[bytes, int],
    depth: int = 0,
    seen: frozenset = frozenset(),
) -> bytes:
    """Splice /Subtype /Form XObject streams at their ``name Do`` sites —
    real PDFs put running headers, watermarks, and letterhead stamps in
    form XObjects, and an interpreter that skips them silently loses that
    text. Nested forms expand against THEIR OWN resources; a visited-set
    plus depth bound (8) terminates reference cycles the same way the
    /Kids walk does. Subset honesty: the form's /Matrix is ignored (this
    interpreter's geometry is the translate-only model used everywhere
    else), and after splicing, name lookup is flat — page bindings win
    over form-local names on collision (the merge in parse_pdf_bytes is
    setdefault)."""
    if depth >= 8 or not forms:
        return content

    def repl(m: "re.Match[bytes]") -> bytes:
        onum = forms.get(m.group(1))
        if onum is None or onum in seen:
            return m.group(0)
        inner = _stream_bytes(objs, onum)
        inner = _expand_forms(
            objs,
            inner,
            _form_xobjects(objs, objs.get(onum, b"")),
            depth + 1,
            seen | {onum},
        )
        return b"\n" + inner + b"\n"

    return _DO_RE.sub(repl, content)


_IWS = rb"[\x00\x09\x0a\x0c\x0d\x20]"
_BI_RE = re.compile(rb"(?:^|" + _IWS + rb")BI(?=" + _IWS + rb"|/)")
_ID_RE = re.compile(rb"(?:^|" + _IWS + rb")ID" + _IWS)
_EI_RE = re.compile(_IWS + rb"EI(?=" + _IWS + rb"|$)")


def _extract_inline_images(
    content: bytes,
    taken=frozenset(),
    facts: dict[str, dict] | None = None,
) -> tuple[bytes, dict[bytes, str]]:
    """Lift BI…ID…EI inline images out of a content stream BEFORE
    tokenization (their binary payload would otherwise shred the token
    scan). Each image is replaced by a synthetic ``/__inlN Do`` so the
    interpreter positions it exactly like an XObject invocation (the
    preceding ``cm`` applies to both forms), and its media_ref follows
    the XObject identity contract: sha256 of the DECODED payload when
    the /F-or-/Filter chain (full or abbreviated names, same decoder as
    regular streams incl. terminal-codec stop) decodes it, sha256 of
    the raw bytes on a corrupt stream.

    Subset honesty (same discipline as the rest of this parser): the
    payload end is the /L length key when present (PDF 2.0), else the
    FIRST whitespace-delimited EI — a raw payload that embeds that byte
    pattern truncates early, exactly the ambiguity /L exists to remove.
    Synthetic names are kept out of ``taken`` (the page's real resource
    names) so an actual /__inl0 resource can't be shadowed. A BI with no
    terminating ID/EI stops extraction and leaves the tail verbatim
    (the tokenizer then sees at worst garbage operands, never text
    loss)."""
    out: list[bytes] = []
    inline: dict[bytes, str] = {}
    pos, n = 0, 0
    while True:
        m = _BI_RE.search(content, pos)
        if not m:
            break
        mid = _ID_RE.search(content, m.end())
        if not mid:
            break
        params = content[m.end() : mid.start()]
        lm = re.search(rb"/L\s+(\d+)", params)
        if lm:
            data_end = mid.end() + int(lm.group(1))
            mei = _EI_RE.search(content, data_end)
        else:
            mei = _EI_RE.search(content, mid.end())
            data_end = mei.start() if mei else -1
        if not mei or data_end > mei.start():
            break
        data = content[mid.end() : data_end]
        decoded = _decode_stream(params, data, inline=True)
        if decoded is not None:
            data = decoded
        # else: corrupt stream → raw-bytes identity; still deterministic
        name = b"__inl%d" % n
        while name in taken:
            name += b"_"
        n += 1
        inline[name] = hashlib.sha256(data).hexdigest()
        if facts is not None and inline[name] not in facts:
            facts[inline[name]] = _image_facts(
                params, name, len(data), inline=True
            )
        out.append(content[pos : m.start()])
        out.append(b" /" + name + b" Do ")
        pos = mei.end()
    out.append(content[pos:])
    return b"".join(out), inline


def _string_bytes(tok: bytes) -> bytes:
    """Raw bytes of a literal ( … ) string (escapes/octal applied) or a
    <hex> string — decoding to text happens per the CURRENT FONT."""
    if tok.startswith(b"<"):
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):  # backslash
            n = body[i + 1 : i + 2]
            esc = {b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
                   b"(": 40, b")": 41, b"\\": 92}
            if n in esc:
                out.append(esc[n])
                i += 2
                continue
            m = re.match(rb"[0-7]{1,3}", body[i + 1 : i + 4])
            if m:
                out.append(int(m.group(0), 8) & 0xFF)
                i += 1 + len(m.group(0))
                continue
            i += 1  # lone backslash: skip (line-continuation semantics)
            continue
        out.append(c)
        i += 1
    return bytes(out)


def _decode_pdf_string(
    tok: bytes, cmap: tuple[int, dict[int, str]] | None = None
) -> str:
    """String token → text: through the current font's /ToUnicode CMap
    when one is in scope (composite/CID fonts — the bytes are code units,
    not characters), else Latin-1 (the simple-font subset default).
    Unmapped codes become U+FFFD, matching extractors that refuse to
    guess glyph identity without a mapping."""
    raw = _string_bytes(tok)
    if cmap is None:
        return raw.decode("latin-1")
    width, mapping = cmap
    end = len(raw) - len(raw) % width
    return "".join(
        mapping.get(int.from_bytes(raw[i : i + width], "big"), "�")
        for i in range(0, end, width)
    )


_NONSTRING_TOKEN_RE = re.compile(
    rb"<<|>>"
    rb"|<[0-9A-Fa-f\s]*>"        # hex string
    rb"|\[|\]"
    rb"|/[^\s()<>\[\]{}/%]*"     # name: any non-delimiter chars (§7.3.5;
                                 # `/TT1-Bold` must lex as ONE token or Tf
                                 # silently keeps the previous font's CMap)
    rb"|[-+]?\d*\.?\d+"
    rb"|[A-Za-z'\"*]+"
)


def _tokenize(content: bytes) -> list[bytes]:
    """Content-stream tokens. Literal ( … ) strings are scanned with a
    paren DEPTH counter honoring backslash escapes — the PDF spec allows
    BALANCED unescaped parens inside literals (`(see (note))` is one
    string), which no single regex alternation can match; a regex-only
    tokenizer silently split such strings and dropped text."""
    out: list[bytes] = []
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # '('
            depth, j = 1, i + 1
            while j < n and depth:
                cj = content[j]
                if cj == 0x5C:  # backslash: skip escaped char
                    j += 2
                    continue
                if cj == 0x28:
                    depth += 1
                elif cj == 0x29:
                    depth -= 1
                j += 1
            out.append(content[i:j])
            i = j
            continue
        m = _NONSTRING_TOKEN_RE.match(content, i)
        if m:
            if m.group(0) not in (b"<<", b">>"):  # dict delims: recognized
                out.append(m.group(0))            # (so they never lex as
            i = m.end()                           # hex strings) but inert
        else:
            i += 1
    return out


def _page_blocks(
    content: bytes,
    page: int,
    page_h: float,
    image_names: dict[bytes, str] | set[bytes],
    fonts: dict[bytes, tuple[int, dict[int, str]]] | None = None,
):
    """Interpret one content stream → PyMuPDF-style block dicts + image
    spans. One block per BT…ET; PDF's y-up origin flipped to top-down so
    blocks_to_spans' (y0, x0) order is visual reading order. `fonts`
    carries per-font /ToUnicode CMaps: the `Tf` operator switches the
    string decoder for subsequent show ops."""
    blocks: list[dict] = []
    images: list[tuple[str, float]] = []  # (name, y_sort)
    fonts = fonts or {}
    cur_cmap: tuple[int, dict[int, str]] | None = None
    tokens = _tokenize(content)
    tx = ty = 0.0
    leading = 12.0
    cm_ty = 0.0
    cur_lines: list[str] = []
    cur_line = ""
    origin: tuple[float, float] | None = None
    stack: list[bytes] = []

    def flush_line():
        nonlocal cur_line
        if cur_line != "":
            cur_lines.append(cur_line)
        cur_line = ""

    def flush_block():
        nonlocal cur_lines, origin
        flush_line()
        if cur_lines and origin is not None:
            x, y = origin
            text = "\n".join(cur_lines)
            blocks.append(
                {
                    "page": page,
                    "x0": x,
                    "y0": page_h - y,  # flip: top-down for reading order
                    "x1": x + 8.0 * max(len(line) for line in cur_lines),
                    "y1": page_h - y + leading * len(cur_lines),
                    "text": text,
                }
            )
        cur_lines, origin = [], None

    def num(tok: bytes) -> float:
        try:
            return float(tok)
        except ValueError:
            return 0.0

    for tok in tokens:
        if tok == b"BT":
            tx = ty = 0.0
            continue
        if tok == b"ET":
            flush_block()
            continue
        if tok in (b"Td", b"TD"):
            if len(stack) >= 2:
                dx, dy = num(stack[-2]), num(stack[-1])
                tx += dx
                ty += dy
                if tok == b"TD":
                    leading = -dy if dy else leading
                if origin is not None:
                    flush_line()
            stack.clear()
            continue
        if tok == b"Tm":
            if len(stack) >= 6:
                tx, ty = num(stack[-2]), num(stack[-1])
                if origin is not None:
                    flush_line()
            stack.clear()
            continue
        if tok == b"T*":
            ty -= leading
            flush_line()
            stack.clear()
            continue
        if tok == b"TL":
            if stack:
                leading = num(stack[-1])
            stack.clear()
            continue
        if tok == b"cm":
            if len(stack) >= 6:
                cm_ty = num(stack[-1])
            stack.clear()
            continue
        if tok == b"Do":
            if stack and stack[-1].startswith(b"/"):
                name = stack[-1][1:]
                if name in image_names:
                    images.append((name.decode("latin-1"), page_h - cm_ty))
            stack.clear()
            continue
        if tok == b"Tf":
            # `/F1 12 Tf`: switch the active font — and with it the
            # string decoder (ToUnicode CMap vs Latin-1 bytes)
            if len(stack) >= 2 and stack[-2].startswith(b"/"):
                cur_cmap = fonts.get(stack[-2])
            stack.clear()
            continue
        if tok in (b"Tj", b"'"):
            if tok == b"'":
                ty -= leading
                flush_line()
            s = next(
                (t for t in reversed(stack) if t.startswith((b"(", b"<"))), None
            )
            if s is not None:
                if origin is None:
                    origin = (tx, ty)
                cur_line += _decode_pdf_string(s, cur_cmap)
            stack.clear()
            continue
        if tok == b"TJ":
            # Strings joined in order; a numeric adjustment at or below
            # TJ_SPACE_KERN (thousandths of an em, negative = rightward
            # gap) is a word space the writer encoded as kerning instead
            # of a space glyph — without this, justified text extracts
            # with its words fused ("Helloworld").
            parts: list[str] = []
            pending_space = False
            for t in stack:
                if t.startswith((b"(", b"<")):
                    s = _decode_pdf_string(t, cur_cmap)
                    if (
                        pending_space
                        and parts
                        and not parts[-1].endswith(" ")
                        and not s.startswith(" ")
                    ):
                        parts.append(" ")
                    pending_space = False
                    parts.append(s)
                elif num(t) <= TJ_SPACE_KERN:
                    pending_space = True
            if parts:
                if origin is None:
                    origin = (tx, ty)
                cur_line += "".join(parts)
            stack.clear()
            continue
        if tok == b"]":
            continue  # keep strings accumulated inside TJ arrays
        if re.fullmatch(rb"[A-Za-z\"*]+", tok):
            stack.clear()  # any unhandled operator: drop its operands
            continue
        stack.append(tok)
    return blocks, images


_ENCRYPT_REF = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")


def _encrypt_obj_num(data: bytes, objs: dict[int, bytes]) -> int | None:
    """Object number of the /Encrypt dict, or None for plaintext files.

    /Encrypt lives in the file trailer (classic xref) or the /XRef
    stream dict (PDF 1.5+) — scan ONLY those regions, not the whole
    buffer: a document that merely mentions the byte sequence in a
    content-stream string must not be treated as encrypted."""
    for m in re.finditer(rb"trailer", data):
        e = _ENCRYPT_REF.search(data, m.end(), m.end() + 2048)
        if e:
            return int(e.group(1))
    for body in objs.values():
        if re.search(rb"/Type\s*/XRef(?![A-Za-z])", body):
            e = _ENCRYPT_REF.search(body.split(b"stream", 1)[0])
            if e:
                return int(e.group(1))
    return None


def _dict_string(body: bytes, key: bytes) -> bytes | None:
    """Direct string value of /key — (literal) or <hex>. The literal
    scan is escape-aware (O/U/UE ciphertext contains unbalanced parens
    and backslashes routinely; writers escape them, _balanced doesn't
    know escapes)."""
    for m in re.finditer(rb"/" + key + rb"(?![A-Za-z0-9_])\s*", body):
        i = m.end()
        nxt = body[i : i + 1]
        if nxt == b"(":
            depth, j = 0, i
            while j < len(body):
                c = body[j]
                if c == 0x5C:  # backslash: skip the escaped byte
                    j += 2
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                    if depth == 0:
                        return _string_bytes(body[i : j + 1])
                j += 1
        elif nxt == b"<" and body[i : i + 2] != b"<<":
            j = body.find(b">", i)
            if j > 0:
                return _string_bytes(body[i : j + 1])
    return None


def _file_id0(data: bytes) -> bytes:
    """First element of the trailer /ID array (hex form — what real
    writers emit). Part of the R≤4 key derivation; files without one
    derive with the empty string, matching other tolerant readers."""
    m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", data)
    if not m:
        return b""
    hx = re.sub(rb"\s", b"", m.group(1))
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _decrypt_streams(data: bytes, objs: dict[int, bytes], enc_num: int) -> None:
    """Decrypt every object's stream payload in place (standard security
    handler, empty user password — see the module contract). Must run
    BEFORE _expand_object_streams: /ObjStm containers are encrypted as
    ordinary streams and their members are NOT re-encrypted. Raises
    ValueError (→ per-document quarantine) when a real user password is
    required or the handler/method is out of subset."""
    from docproc_spark.kernels import pdfcrypt

    enc = objs.get(enc_num)
    if enc is None:
        raise ValueError("encrypted PDF (encryption dictionary not found)")
    enc = enc.split(b"stream", 1)[0]  # dict part only, like filter parsing
    if not re.search(rb"/Filter\s*/Standard(?![A-Za-z])", enc):
        raise ValueError("encrypted PDF (non-standard security handler)")

    def _int(key: bytes, default: int) -> int:
        m = re.search(rb"/" + key + rb"\s+(-?\d+)", enc)
        return int(m.group(1)) if m else default

    v, r = _int(b"V", 0), _int(b"R", 2)
    length_bits = _int(b"Length", 40)
    if length_bits < 40:  # some writers record bytes in /Length
        length_bits *= 8
    o_entry = _dict_string(enc, b"O")
    u_entry = _dict_string(enc, b"U")
    if o_entry is None or u_entry is None:
        raise ValueError("encrypted PDF (malformed /O //U entries)")
    encrypt_metadata = not re.search(rb"/EncryptMetadata\s+false", enc)
    aes = v >= 5  # V=5 is AES-256 (/AESV3) by definition
    identity = False
    if v == 4:
        stmf = re.search(rb"/StmF\s*/([^\s/<>\[\]()]+)", enc)
        name = stmf.group(1) if stmf else b"Identity"
        if name == b"Identity":
            identity = True  # streams not encrypted (default per spec)
        else:
            cf = re.search(
                rb"/" + re.escape(name) + rb"\s*<<(.*?)>>", enc, re.S
            )
            cfm = re.search(rb"/CFM\s*/(\w+)", cf.group(1) if cf else enc)
            method = cfm.group(1) if cfm else b"None"
            if method == b"AESV2":
                aes = True
            elif method == b"V2":
                aes = False
            elif method == b"None":
                identity = True
            else:
                raise ValueError(
                    "encrypted PDF (unsupported crypt method /CFM "
                    f"{method.decode('latin-1')})"
                )
    key = pdfcrypt.file_key(
        r=r,
        v=v,
        length_bits=length_bits,
        o_entry=o_entry,
        u_entry=u_entry,
        ue_entry=_dict_string(enc, b"UE"),
        p=_int(b"P", -1),
        id0=_file_id0(data),
        encrypt_metadata=encrypt_metadata,
    )
    if identity:
        return
    for num, body in list(objs.items()):
        if num == enc_num:
            continue
        m = _STREAM_RE.search(body)
        if not m:
            continue  # dict-level strings stay ciphertext (module contract)
        head = body[: m.start()]
        if re.search(rb"/Type\s*/XRef(?![A-Za-z])", head):
            continue  # cross-reference streams are never encrypted
        if not encrypt_metadata and re.search(
            rb"/Type\s*/Metadata(?![A-Za-z])", head
        ):
            continue
        okey = key if v >= 5 else pdfcrypt.object_key(key, num, 0, aes=aes)
        dec = (
            pdfcrypt.aes_cbc_decrypt(okey, m.group(1))
            if aes
            else pdfcrypt.rc4(okey, m.group(1))
        )
        if dec is None:
            dec = b""  # corrupt crypt payload → quarantine-empty, like a failed filter
        objs[num] = body[: m.start(1)] + dec + body[m.end(1) :]


def parse_pdf_bytes(
    data: bytes, media_facts: dict[str, dict] | None = None
) -> list[tuple[str, str | None, str | None, int]]:
    """bytes → [(kind, text, media_ref, page)] — text blocks in pdf_layout
    reading order with layout classification, image spans at their
    transform position. When ``media_facts`` is given, every distinct
    image blob also records its sidecar facts (blob size, format of the
    identity bytes, dict /Width /Height) keyed by media_ref — the
    media-catalogue hook (sources/media_sidecar.py) that shares this one
    parse instead of re-walking the file."""
    objs = _objects(data)  # decrypts empty-user-password files in place;
    # password-protected / out-of-subset encryption raises → quarantine
    if not objs:
        raise ValueError("no PDF objects found")
    all_blocks: list[dict] = []
    image_rows: list[tuple[int, float, str, str]] = []  # (page, y, name, ref)
    page_heights: dict[int, float] = {}
    # document-scoped memoization: pages share fonts and images — parse a
    # ToUnicode CMap / hash an XObject stream once per OBJECT, not per page
    cmap_cache: dict[int, tuple[int, dict[int, str]]] = {}
    img_cache: dict[int, str] = {}
    for page, num in enumerate(_page_order(objs)):
        body = objs[num]
        _, page_h = _media_box(objs, body)
        page_heights[page] = page_h
        content = _content_streams(objs, body)
        xobjs = _image_xobjects(objs, body, cache=img_cache, facts=media_facts)
        fonts = _font_cmaps(objs, body, cache=cmap_cache)
        forms = _form_xobjects(objs, body)
        if forms:
            content = _expand_forms(objs, content, forms)
            # form-local images/fonts resolve flat after the splice; page
            # bindings win on name collision (setdefault — the documented
            # _expand_forms subset), transitively through nested forms
            fstack, fseen = list(forms.values()), set(forms.values())
            while fstack:
                fbody = objs.get(fstack.pop(), b"")
                for k, v in _image_xobjects(
                    objs, fbody, cache=img_cache, facts=media_facts
                ).items():
                    xobjs.setdefault(k, v)
                for k, v in _font_cmaps(objs, fbody, cache=cmap_cache).items():
                    fonts.setdefault(k, v)
                for fnum in _form_xobjects(objs, fbody).values():
                    if fnum not in fseen:
                        fseen.add(fnum)
                        fstack.append(fnum)
        content, inline = _extract_inline_images(
            content, taken=set(xobjs), facts=media_facts
        )
        xobjs.update(inline)
        blocks, images = _page_blocks(
            content, page, page_h, xobjs, fonts=fonts,
        )
        all_blocks.extend(blocks)
        # ordering key stays the page-local resource name (deterministic
        # tie-break); the emitted media_ref is the content hash
        image_rows.extend(
            (page, y, name, xobjs.get(name.encode("latin-1"), name))
            for name, y in images
        )
    # a parseable file with no /Page objects yields zero spans (empty doc),
    # not a quarantine row; each page classifies against its OWN height
    spans = [
        (s["kind"], s["text"], s["media_ref"], s["page"])
        for s in blocks_to_spans(all_blocks, page_heights=page_heights)
    ]
    # interleave image spans after the page's text spans (the reference
    # collects page images separately after text, pdf_loader.py:38-49)
    out: list[tuple[str, str | None, str | None, int]] = []
    pages = sorted({p for *_, p in spans} | {p for p, *_ in image_rows})
    for p in pages:
        out.extend(s for s in spans if s[3] == p)
        out.extend(
            ("image", None, ref, p)
            for pg, y, name, ref in sorted(
                image_rows, key=lambda r: (r[0], r[1], r[2])
            )
            if pg == p
        )
    return out


def load_pdf(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, content:binary) → span table (same schema/contract as
    sources/ooxml.load_ooxml: one mapInPandas pass, per-document
    quarantine via parse_error, ingest-time n_spans routing column)."""
    import pandas as pd

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for did, blob in zip(pdf[doc_id_col], pdf[content_col]):
                row = {
                    "doc_id": did,
                    "doc_type": "pdf",
                    "raw_html": None,
                    "spans": None,
                    "n_spans": None,
                    "sheet_names": None,
                    "parse_error": None,
                }
                try:
                    raw = parse_pdf_bytes(bytes(blob))
                    row["spans"] = [
                        {"kind": k, "text": t, "media_ref": m, "page": p,
                         "offset": i}
                        for i, (k, t, m, p) in enumerate(raw)
                    ]
                    row["n_spans"] = len(raw)
                except Exception as e:  # noqa: BLE001 — per-doc quarantine
                    row["parse_error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in OOXML_OUT_SCHEMA])

    return docs.mapInPandas(gen, schema=OOXML_OUT_SCHEMA)
