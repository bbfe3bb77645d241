"""WebDataset tar-shard ingestion (sources/webdataset.py).

Shards are real tars assembled at test time with stdlib tarfile;
expectations follow the WebDataset grouping rule (key = basename up to
the FIRST dot; samples may interleave) with sha256-of-bytes media
identity and header facts from kernels/mediainfo.
"""

from __future__ import annotations

import hashlib
import io
import struct
import tarfile
import zlib

import pytest

from docproc_spark.sources.webdataset import (
    iter_wds_samples,
    load_webdataset,
    wds_documents,
)


def make_png(w: int, h: int) -> bytes:
    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")


IMG = make_png(64, 48)
IMG_SHA = hashlib.sha256(IMG).hexdigest()


def make_tar(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, blob in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    return buf.getvalue()


SHARD = make_tar(
    {
        "000001.png": IMG,
        "000001.txt": b"a cat photo",
        "000001.json": b'{"url": "http://x"}',
        # second sample interleaves a dotted dir name and a double ext
        "dir.v2/000002.seg.png": IMG,
        "dir.v2/000002.txt": b"same image twice",
    }
)


class TestIter:
    def test_grouping_text_json_media(self):
        rows = list(iter_wds_samples(SHARD, "s0.tar"))
        assert [r["key"] for r in rows] == ["000001", "dir.v2/000002"]
        a = rows[0]
        assert a["doc_id"] == "s0.tar#000001"
        assert a["text"] == "a cat photo"
        assert a["meta_json"] == '{"url": "http://x"}'
        assert len(a["media"]) == 1
        m = a["media"][0]
        assert (m["ext"], m["media_ref"]) == ("png", IMG_SHA)
        assert (m["format"], m["width"], m["height"]) == ("png", 64, 48)
        # first-dot rule: ext of the second sample's image is "seg.png"
        b = rows[1]
        assert b["media"][0]["ext"] == "seg.png"
        assert b["media"][0]["media_ref"] == IMG_SHA  # content identity

    def test_bad_archive_raises(self):
        with pytest.raises(Exception):
            list(iter_wds_samples(b"not a tar", "x"))


@pytest.mark.usefixtures("spark")
class TestSpark:
    def test_load_and_documents(self, spark):
        df = spark.createDataFrame(
            [("s0.tar", bytearray(SHARD)), ("bad.tar", bytearray(b"junk"))],
            "doc_id string, content binary",
        )
        samples = load_webdataset(df).collect()
        ok = [r for r in samples if r["parse_error"] is None]
        bad = [r for r in samples if r["parse_error"] is not None]
        assert len(ok) == 2 and [r["doc_id"] for r in bad] == ["bad.tar"]

        docs = {r["doc_id"]: r for r in wds_documents(load_webdataset(df)).collect()}
        d = docs["s0.tar#000001"]
        assert d["doc_type"] == "wds" and d["n_spans"] == 2
        assert [s["kind"] for s in d["spans"]] == ["text", "image"]
        assert d["spans"][1]["media_ref"] == IMG_SHA
        assert [s["offset"] for s in d["spans"]] == [0, 1]
        # a sample with no text yields media-only spans; quarantine
        # shards are excluded
        assert "bad.tar" not in docs

    def test_documents_feed_extract(self, spark):
        from docproc_spark.pipeline import extract

        df = spark.createDataFrame(
            [("s0.tar", bytearray(SHARD))], "doc_id string, content binary"
        )
        out = {
            r["doc_id"]: r
            for r in extract(wds_documents(load_webdataset(df))).collect()
        }
        assert "a cat photo" in out["s0.tar#000001"]["markdown"]

    def test_facade(self, spark, tmp_path):
        from docproc_spark.facade import DocprocSpark

        (tmp_path / "s0.tar").write_bytes(SHARD)
        rows = DocprocSpark(spark).load_webdataset(str(tmp_path)).collect()
        assert {r["key"] for r in rows} == {"000001", "dir.v2/000002"}


@pytest.mark.usefixtures("spark")
class TestMediaTableAndExport:
    def test_wds_media_table_shape(self, spark):
        df = spark.createDataFrame(
            [("s0.tar", bytearray(SHARD))], "doc_id string, content binary"
        )
        from docproc_spark.sources.webdataset import wds_media_table

        rows = wds_media_table(load_webdataset(df)).collect()
        assert len(rows) == 2
        r = {x["doc_id"]: x for x in rows}["s0.tar#000001"]
        assert (r["media_ref"], r["name"], r["n_refs"]) == (IMG_SHA, "png", 1)
        assert (r["width"], r["height"]) == (64, 48)
        # same columns as the document sidecar's flat catalogue
        from docproc_spark.sources.media_sidecar import MEDIA_SIDECAR_SCHEMA

        assert [f.name for f in MEDIA_SIDECAR_SCHEMA if f.name != "parse_error"] == [
            x for x in wds_media_table(load_webdataset(df)).columns
        ]

    def test_export_round_trips_through_the_reader(self, spark, tmp_path):
        from docproc_spark.sources.webdataset import export_webdataset_text

        docs = spark.createDataFrame(
            [
                ("a/doc.one", "first text", "s1"),
                ("b", "second text", "s2"),
            ],
            "doc_id string, markdown string, source string",
        ).repartition(1)
        out = tmp_path / "wds"
        export_webdataset_text(
            docs, str(out), meta_cols=("source",)
        )
        shards = sorted(p.name for p in out.iterdir())
        assert len(shards) == 1  # empty partitions write no shards
        back = spark.createDataFrame(
            [(s, bytearray((out / s).read_bytes())) for s in shards],
            "doc_id string, content binary",
        )
        samples = {r["key"]: r for r in load_webdataset(back).collect()}
        assert set(samples) == {"a_doc_one", "b"}
        a = samples["a_doc_one"]
        assert a["text"] == "first text"
        import json

        meta = json.loads(a["meta_json"])
        assert meta == {"doc_id": "a/doc.one", "source": "s1"}


def test_facade_reads_gzipped_shards(spark, tmp_path):
    import gzip

    from docproc_spark.facade import DocprocSpark

    (tmp_path / "s1.tar.gz").write_bytes(gzip.compress(SHARD))
    rows = DocprocSpark(spark).load_webdataset(str(tmp_path)).collect()
    assert {r["key"] for r in rows} == {"000001", "dir.v2/000002"}
    assert all(r["parse_error"] is None for r in rows)


class TestSignatures:
    def _shard(self):
        from docproc_spark.kernels.imagepix import encode_png

        px = bytes((x * 11 + y * 7) % 256
                   for y in range(12) for x in range(16) for _ in range(3))
        real = encode_png(px, 16, 12)
        return real, make_tar(
            {
                "a.png": real,
                "a.txt": b"caption",
                "b.png": IMG,  # header-only PNG: decode_error row
                "b.txt": b"caption two",
                "c.wav": b"RIFF\x00\x00\x00\x00WAVE",  # audio: skipped
            }
        )

    def test_iter_signature_rows(self):
        from docproc_spark.kernels.imagepix import image_signature
        from docproc_spark.sources.webdataset import iter_wds_signatures

        real, shard = self._shard()
        rows = {r["doc_id"]: r for r in iter_wds_signatures(shard, "s0")}
        assert set(rows) == {"s0#a", "s0#b"}
        a = rows["s0#a"]
        assert a["media_ref"] == hashlib.sha256(real).hexdigest()
        assert (a["width"], a["height"]) == (16, 12)
        assert a["dhash64"] == image_signature(real)["dhash64"]
        assert rows["s0#b"]["decode_error"]  # header-only PNG

    def test_spark_loader_and_quarantine(self, spark):
        from docproc_spark.sources.webdataset import load_wds_signatures

        real, shard = self._shard()
        df = spark.createDataFrame(
            [("s0.tar", bytearray(shard)), ("bad.tar", bytearray(b"junk"))],
            "doc_id string, content binary",
        )
        rows = load_wds_signatures(df).collect()
        bad = [r for r in rows if r["parse_error"] is not None]
        assert [r["doc_id"] for r in bad] == ["bad.tar"]
        ok = {r["doc_id"] for r in rows if r["parse_error"] is None}
        assert ok == {"s0.tar#a", "s0.tar#b"}

    def test_identity_matches_sample_table(self):
        from docproc_spark.sources.webdataset import iter_wds_signatures

        real, shard = self._shard()
        sig_refs = {r["media_ref"] for r in iter_wds_signatures(shard, "s")}
        sample_refs = {
            m["media_ref"]
            for row in iter_wds_samples(shard, "s")
            for m in row["media"]
        }
        assert sig_refs <= sample_refs
