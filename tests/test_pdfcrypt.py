"""kernels/pdfcrypt unit tests — every primitive pinned to PUBLIC test
vectors (FIPS-197 Appendix C, NIST SP 800-38A, the classic RC4 vectors)
so the implementation can never be "self-consistently wrong": the
fixture encryptor in test_pdf_source round-trips through the same code,
and these vectors anchor it to the outside world."""

import hashlib

import pytest

from docproc_spark.kernels import pdfcrypt as pc


class TestAesVectors:
    PT = bytes.fromhex("00112233445566778899aabbccddeeff")

    @pytest.mark.parametrize(
        "key,want",
        [
            (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
            (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
            (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
        ],
        ids=["aes128", "aes192", "aes256"],
    )
    def test_fips197_appendix_c(self, key, want):
        rk = pc._expand_key(key)
        ct = pc._encrypt_block(rk, self.PT)
        assert ct.hex() == want
        assert pc._decrypt_block(rk, ct) == self.PT

    def test_sbox_is_a_bijection_with_spec_anchors(self):
        assert sorted(pc._SBOX) == list(range(256))
        # FIPS-197 table anchors incl. the 0 and 1 inverses (the classic
        # exp/log-table off-by-one lives exactly at SBOX[1])
        assert pc._SBOX[0x00] == 0x63
        assert pc._SBOX[0x01] == 0x7C
        assert pc._SBOX[0x53] == 0xED
        assert pc._INV_SBOX[0x63] == 0x00

    def test_key_expansion_fips197_a1(self):
        rk = pc._expand_key(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
        assert bytes(rk[1]).hex() == "a0fafe1788542cb123a339392a6c7605"

    def test_cbc_nist_sp800_38a(self):
        key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
        iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        p1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
        c1 = pc.aes_cbc_encrypt_nopad(key, iv, p1)
        assert c1.hex() == "7649abac8119b246cee98e9b12e9197d"
        assert pc.aes_cbc_decrypt_nopad(key, iv, c1) == p1

    def test_padded_cbc_roundtrip_all_lengths(self):
        key, iv = b"k" * 16, b"i" * 16
        for n in range(0, 49):
            blob = bytes(range(256))[:n]
            assert pc.aes_cbc_decrypt(key, pc.aes_cbc_encrypt(key, iv, blob)) == blob

    def test_padded_cbc_rejects_malformed(self):
        key = b"k" * 16
        assert pc.aes_cbc_decrypt(key, b"short") is None
        assert pc.aes_cbc_decrypt(key, b"x" * 33) is None  # non-aligned
        # valid-length garbage decrypts to impossible padding (almost
        # surely) — must return None, never raise
        assert pc.aes_cbc_decrypt(key, b"\x00" * 32) is None


class TestRc4:
    @pytest.mark.parametrize(
        "key,pt,want",
        [
            (b"Key", b"Plaintext", "bbf316e8d940af0ad3"),
            (b"Wiki", b"pedia", "1021bf0420"),
            (b"Secret", b"Attack at dawn", "45a01f645fc35b383552544b9bf5"),
        ],
    )
    def test_classic_vectors(self, key, pt, want):
        assert pc.rc4(key, pt).hex() == want
        assert pc.rc4(key, bytes.fromhex(want)) == pt  # symmetric


class TestStandardHandler:
    ID0 = b"\x01\x02" * 8

    @pytest.mark.parametrize("r,bits", [(2, 40), (3, 128), (4, 128)])
    def test_o_u_roundtrip_empty_user_password(self, r, bits):
        o = pc.compute_o_entry(b"owner", b"", r, bits)
        key = pc._r234_file_key(b"", o, -44, self.ID0, r, bits, True)
        u = pc.compute_u_entry(key, self.ID0, r)
        got = pc.file_key(
            r=r, v=2, length_bits=bits, o_entry=o, u_entry=u, ue_entry=None,
            p=-44, id0=self.ID0, encrypt_metadata=True,
        )
        assert got == key
        assert len(key) == (5 if r == 2 else bits // 8)

    def test_wrong_password_raises(self):
        o = pc.compute_o_entry(b"owner", b"secret", 3, 128)
        key = pc._r234_file_key(b"secret", o, -44, self.ID0, 3, 128, True)
        u = pc.compute_u_entry(key, self.ID0, 3)
        with pytest.raises(ValueError, match="password"):
            pc.file_key(
                r=3, v=2, length_bits=128, o_entry=o, u_entry=u,
                ue_entry=None, p=-44, id0=self.ID0, encrypt_metadata=True,
            )

    def test_unsigned_p_serialization_accepted(self):
        # /P is a signed 32-bit value some writers serialize unsigned
        o = pc.compute_o_entry(b"owner", b"", 3, 128)
        k_signed = pc._r234_file_key(b"", o, -44, self.ID0, 3, 128, True)
        k_unsigned = pc._r234_file_key(
            b"", o, (1 << 32) - 44, self.ID0, 3, 128, True
        )
        assert k_signed == k_unsigned

    @pytest.mark.parametrize("r", [5, 6])
    def test_aes256_file_key_roundtrip(self, r):
        fkey = hashlib.sha256(b"seed").digest()
        vs, ks = b"vsalt678", b"ksalt678"
        if r == 6:
            u = pc._hash_2b(b"", vs, b"") + vs + ks
            inter = pc._hash_2b(b"", ks, b"")
        else:
            u = hashlib.sha256(vs).digest() + vs + ks
            inter = hashlib.sha256(ks).digest()
        ue = pc.aes_cbc_encrypt_nopad(inter, b"\x00" * 16, fkey)
        got = pc.file_key(
            r=r, v=5, length_bits=256, o_entry=b"\x00" * 48, u_entry=u,
            ue_entry=ue, p=-4, id0=b"", encrypt_metadata=True,
        )
        assert got == fkey

    def test_hash_2b_terminates_and_is_deterministic(self):
        a = pc._hash_2b(b"", b"saltsalt", b"")
        b = pc._hash_2b(b"", b"saltsalt", b"")
        assert a == b and len(a) == 32
        assert pc._hash_2b(b"x", b"saltsalt", b"") != a

    def test_unsupported_revision_raises(self):
        with pytest.raises(ValueError, match="unsupported security revision"):
            pc.file_key(
                r=7, v=6, length_bits=256, o_entry=b"", u_entry=b"",
                ue_entry=b"", p=-1, id0=b"", encrypt_metadata=True,
            )

    def test_object_key_shape(self):
        fkey = b"\xaa" * 16
        k_rc4 = pc.object_key(fkey, 7, 0, aes=False)
        k_aes = pc.object_key(fkey, 7, 0, aes=True)
        assert len(k_rc4) == 16 and len(k_aes) == 16
        assert k_rc4 != k_aes  # the sAlT suffix must matter
        # 40-bit key: n+5 = 10 bytes
        assert len(pc.object_key(b"\xbb" * 5, 1, 0, aes=False)) == 10
