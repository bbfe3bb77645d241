"""PDF standard security handler (ISO 32000-1 §7.6.3, 32000-2 §7.6.4).

Pure-stdlib decryption for the single most common "encrypted" PDF in a
web corpus: owner-password-only protection (print/copy restrictions)
with an EMPTY user password, which every viewer — and the reference via
PyMuPDF (`docproc/doc/loaders/pdf_loader.py:17` opens such files
transparently) — reads without prompting. Covers:

  - R=2 (RC4-40), R=3 (RC4-40..128), R=4 (/CFM V2 RC4 or AESV2
    AES-128-CBC) with the Algorithm-2 MD5 key schedule;
  - R=6 (PDF 2.0 AES-256, /CFM AESV3) with the Algorithm-2.B iterated
    SHA-256/384/512 hash, plus the deprecated-but-shipped R=5 variant
    (plain SHA-256, Adobe Extension Level 3).

Files that genuinely require a user password fail verification and the
caller quarantines them with a precise reason — refusing to guess, not
silently emitting ciphertext.

RC4 and AES are implemented here (no crypto library in the container):
AES is the straightforward spec cipher with tables derived at import
from the GF(2^8) construction — encrypted documents are a corpus
minority, so per-block Python cost is acceptable and documented; the
forward direction exists because CBC-MAC-style encryption is part of
the R=6 KEY DERIVATION itself (Algorithm 2.B), not just test fixtures.
"""

from __future__ import annotations

import hashlib
import struct

# §7.6.3.3 Algorithm 2 padding string (public spec constant).
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 is symmetric: same function encrypts and decrypts."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------- AES
# Tables derived from the spec's GF(2^8) construction (x^8+x^4+x^3+x+1)
# rather than transcribed — the derivation IS the reference.

def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverses via exp/log tables over generator 3
    exp, log = [0] * 256, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    sbox, inv = [0] * 256, [0] * 256
    for i in range(256):
        v = 0 if i == 0 else exp[(255 - log[i]) % 255]
        # affine transform
        s = v
        for _ in range(4):
            v = ((v << 1) | (v >> 7)) & 0xFF
            s ^= v
        s ^= 0x63
        sbox[i] = s
        inv[s] = i
    return sbox, inv


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [1]
while len(_RCON) < 14:
    _RCON.append(_gf_mul(_RCON[-1], 2))


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    assert nk in (4, 6, 8), "AES key must be 128/192/256-bit"
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    # group into round keys of 16 bytes (column-major state order)
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


def _encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[0])]
    nr = len(rk) - 1
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major flat state: byte (r, c) at 4c+r
        s = [s[(4 * ((i // 4) + (i % 4)) + (i % 4)) % 16] for i in range(16)]
        if rnd != nr:
            t = []
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                t += [
                    _gf_mul(a[0], 2) ^ _gf_mul(a[1], 3) ^ a[2] ^ a[3],
                    a[0] ^ _gf_mul(a[1], 2) ^ _gf_mul(a[2], 3) ^ a[3],
                    a[0] ^ a[1] ^ _gf_mul(a[2], 2) ^ _gf_mul(a[3], 3),
                    _gf_mul(a[0], 3) ^ a[1] ^ a[2] ^ _gf_mul(a[3], 2),
                ]
            s = t
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    return bytes(s)


def _decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[nr])]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows then InvSubBytes
        s = [s[(4 * ((i // 4) - (i % 4)) + (i % 4)) % 16] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        if rnd != 0:
            t = []
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                t += [
                    _gf_mul(a[0], 14) ^ _gf_mul(a[1], 11)
                    ^ _gf_mul(a[2], 13) ^ _gf_mul(a[3], 9),
                    _gf_mul(a[0], 9) ^ _gf_mul(a[1], 14)
                    ^ _gf_mul(a[2], 11) ^ _gf_mul(a[3], 13),
                    _gf_mul(a[0], 13) ^ _gf_mul(a[1], 9)
                    ^ _gf_mul(a[2], 14) ^ _gf_mul(a[3], 11),
                    _gf_mul(a[0], 11) ^ _gf_mul(a[1], 13)
                    ^ _gf_mul(a[2], 9) ^ _gf_mul(a[3], 14),
                ]
            s = t
    return bytes(s)


def aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """len(data) must be a multiple of 16 (R=6 Algorithm 2.B input is)."""
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(rk, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        ct = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, ct), prev))
        prev = ct
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PKCS#5-padded CBC encrypt, returning iv + ciphertext — the PDF
    stream crypt layout (§7.6.2: 16-byte IV prefix, always-on padding)."""
    padlen = 16 - (len(data) % 16)
    return iv + aes_cbc_encrypt_nopad(key, iv, data + bytes([padlen]) * padlen)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes | None:
    """Decrypt a PDF crypt-filter payload (iv ‖ ciphertext, PKCS#5).

    Returns None on malformed input (truncated / non-block-aligned /
    impossible padding) — the caller treats that as a corrupt stream,
    exactly like a failed /FlateDecode."""
    if len(data) < 32 or len(data) % 16:
        return None
    pt = aes_cbc_decrypt_nopad(key, data[:16], data[16:])
    padlen = pt[-1]
    if not 1 <= padlen <= 16 or pt[-padlen:] != bytes([padlen]) * padlen:
        return None
    return pt[:-padlen]


# ------------------------------------------- standard security handler

def _r234_file_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    length_bits: int,
    encrypt_metadata: bool,
) -> bytes:
    """Algorithm 2: password → file encryption key (R ≤ 4)."""
    if p >= 1 << 31:  # /P may be serialized as unsigned
        p -= 1 << 32
    h = hashlib.md5(
        (password + PAD)[:32] + o_entry[:32] + struct.pack("<i", p) + id0
    )
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    n = length_bits // 8 if r >= 3 else 5
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _r234_user_check(key: bytes, u_entry: bytes, id0: bytes, r: int) -> bool:
    """Algorithms 4/5: does `key` open this file's /U entry?"""
    if r == 2:
        return rc4(key, PAD) == u_entry[:32]
    u = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u[:16] == u_entry[:16]


def compute_o_entry(
    owner_pw: bytes, user_pw: bytes, r: int, length_bits: int
) -> bytes:
    """Algorithm 3 — forward direction (fixture generation + round-trip
    tests; a writer needs it, a reader doesn't)."""
    h = hashlib.md5((owner_pw + PAD)[:32]).digest()
    n = 5
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
        n = length_bits // 8
    rc4key = h[:n]
    o = rc4(rc4key, (user_pw + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4key), o)
    return o


def compute_u_entry(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4/5 — forward direction."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # 16 bytes arbitrary padding per Algorithm 5


def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B iterated hash (R=6)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        # first 16 bytes of E as a big-endian integer, mod 3 — and since
        # 256 ≡ 1 (mod 3) that integer's residue IS the byte-sum residue
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _r56_file_key(password: bytes, u_entry: bytes, ue_entry: bytes, r: int) -> bytes | None:
    """AES-256 user-password path (R=5 Adobe ext / R=6 PDF 2.0).

    /U = hash(32) ‖ validation-salt(8) ‖ key-salt(8); on validation
    success the file key is AES-256-CBC(iv=0, /UE) under the
    intermediate key. Returns None when the password fails."""
    if len(u_entry) < 48 or len(ue_entry) < 32:
        return None
    vsalt, ksalt = u_entry[32:40], u_entry[40:48]
    if r == 5:
        good = hashlib.sha256(password + vsalt).digest() == u_entry[:32]
        inter = hashlib.sha256(password + ksalt).digest()
    else:
        good = _hash_2b(password, vsalt, b"") == u_entry[:32]
        inter = _hash_2b(password, ksalt, b"")
    if not good:
        return None
    return aes_cbc_decrypt_nopad(inter, b"\x00" * 16, ue_entry[:32])


def file_key(
    *,
    r: int,
    v: int,
    length_bits: int,
    o_entry: bytes,
    u_entry: bytes,
    ue_entry: bytes | None,
    p: int,
    id0: bytes,
    encrypt_metadata: bool,
    password: bytes = b"",
) -> bytes:
    """Verify `password` (default: the empty user password) and return
    the file encryption key. Raises ValueError with a quarantine-ready
    reason when the password fails or the revision is unsupported."""
    if r in (2, 3, 4):
        key = _r234_file_key(
            password, o_entry, p, id0, r, length_bits, encrypt_metadata
        )
        if not _r234_user_check(key, u_entry, id0, r):
            raise ValueError("password-protected PDF (user password required)")
        return key
    if r in (5, 6):
        key = _r56_file_key(password, u_entry, ue_entry or b"", r)
        if key is None:
            raise ValueError("password-protected PDF (user password required)")
        return key
    raise ValueError(f"encrypted PDF (unsupported security revision R={r})")


def object_key(fkey: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Per-object key (Algorithm 1, V ≤ 4). V=5 uses the file key
    directly — callers pass that through without calling this."""
    h = hashlib.md5(
        fkey
        + struct.pack("<I", num)[:3]
        + struct.pack("<I", gen)[:2]
        + (b"sAlT" if aes else b"")
    )
    return h.digest()[: min(len(fkey) + 5, 16)]
