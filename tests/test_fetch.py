"""S9 fetch layer (orion/utils.py:47-303 parity): landing-zone downloads,
mtime-derived versions, archive staging, split, CLI, and the end-to-end
fetch -> parse -> normalize -> merge ingest. Hermetic: drives HTTP against
an in-process http.server and file:// URLs — no network.
"""

import gzip
import io
import json
import os
import tarfile
import threading
import zipfile
from datetime import datetime, timezone
from http.server import HTTPServer, SimpleHTTPRequestHandler

import pytest

from orion_spark.sources import fetch as FX


# ---------------------------------------------------------------------------
# local HTTP stub
# ---------------------------------------------------------------------------

@pytest.fixture()
def http_root(tmp_path):
    root = tmp_path / "www"
    root.mkdir()

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield root, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_version_string_format():
    # the reference's no-zero-padding M_D_YYYY / M_YYYY format
    # (orion/utils.py:112-117,193)
    dt = datetime(2024, 3, 7, 12, 0, tzinfo=timezone.utc)
    assert FX._version_string(dt) == "3_7_2024"
    assert FX._version_string(dt, exclude_day=True) == "3_2024"


def test_http_modified_version_file_url(tmp_path):
    f = tmp_path / "src.tsv"
    f.write_text("a\tb\n")
    stamp = datetime(2023, 11, 5, 8, 30, tzinfo=timezone.utc).timestamp()
    os.utime(f, (stamp, stamp))
    assert FX.http_modified_version(f.as_uri()) == "11_5_2023"


def test_fetch_http_idempotent_and_atomic(tmp_path):
    src = tmp_path / "data.txt"
    src.write_text("hello world\n")
    dd = str(tmp_path / "landing")
    path, n = FX.fetch_http(src.as_uri(), dd)
    assert open(path).read() == "hello world\n" and n == 12
    assert not os.path.exists(path + ".part")
    # second fetch short-circuits (0 bytes transferred), keeps content
    src.write_text("changed\n")
    path2, n2 = FX.fetch_http(src.as_uri(), dd)
    assert path2 == path and n2 == 0
    assert open(path).read() == "hello world\n"


def test_fetch_http_error_cleans_partial(tmp_path):
    with pytest.raises(FX.FetchError):
        FX.fetch_http((tmp_path / "missing.bin").as_uri(), str(tmp_path / "d"))
    assert not any(
        p.endswith(".part") for p in os.listdir(tmp_path / "d")
    ) if (tmp_path / "d").exists() else True


def test_fetch_http_over_real_server(http_root, tmp_path):
    root, base = http_root
    (root / "nodes.jsonl").write_text('{"id": "A:1"}\n')
    path, n = FX.fetch_http(f"{base}/nodes.jsonl", str(tmp_path / "zone"))
    assert n == 14 and open(path).read().startswith('{"id"')
    # Last-Modified-derived version matches the file's mtime date
    mt = datetime.fromtimestamp(
        os.path.getmtime(root / "nodes.jsonl"), tz=timezone.utc
    )
    assert FX.http_modified_version(f"{base}/nodes.jsonl") == FX._version_string(mt)


def test_extract_archive_zip_tar_gz(tmp_path):
    out = str(tmp_path / "staged")
    # zip with nested member
    zp = tmp_path / "a.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("sub/inner.tsv", "x\t1\n")
        zf.writestr("top.txt", "t\n")
    got = FX.extract_archive(str(zp), out)
    assert sorted(os.path.basename(g) for g in got) == ["inner.tsv", "top.txt"]
    assert open(os.path.join(out, "sub", "inner.tsv")).read() == "x\t1\n"
    # member subset
    assert FX.extract_archive(str(zp), out, members=["top.txt"]) == [
        os.path.join(out, "top.txt")
    ]
    # tar.gz
    tp = tmp_path / "b.tar.gz"
    with tarfile.open(tp, "w:gz") as tf:
        data = b"row\n"
        info = tarfile.TarInfo("d/f.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    got = FX.extract_archive(str(tp), out)
    assert open(got[0]).read() == "row\n"
    # bare gz
    gp = tmp_path / "c.txt.gz"
    with gzip.open(gp, "wt") as fh:
        fh.write("gz line\n")
    got = FX.extract_archive(str(gp), out)
    assert got == [os.path.join(out, "c.txt")]
    assert open(got[0]).read() == "gz line\n"


def test_extract_archive_refuses_traversal(tmp_path):
    zp = tmp_path / "evil.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("../../escape.txt", "bad")
    with pytest.raises(FX.FetchError, match="escapes"):
        FX.extract_archive(str(zp), str(tmp_path / "out"))


def test_split_text_member(tmp_path):
    src = tmp_path / "big.tsv"
    src.write_text("".join(f"row{i}\n" for i in range(10)))
    parts = FX.split_text_member(str(src), str(tmp_path / "parts"), lines_per_file=4)
    assert [os.path.basename(p) for p in parts] == [
        "big.tsv.1", "big.tsv.2", "big.tsv.3"]
    assert open(parts[0]).read() == "row0\nrow1\nrow2\nrow3\n"
    assert open(parts[2]).read() == "row8\nrow9\n"
    # gz input splits the decompressed lines (the scale rationale: a .gz
    # source is one Spark partition until split)
    gz = tmp_path / "big2.tsv.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write("".join(f"g{i}\n" for i in range(5)))
    parts = FX.split_text_member(str(gz), str(tmp_path / "parts2"), lines_per_file=2)
    assert len(parts) == 3 and open(parts[-1]).read() == "g4\n"


def test_fetch_source_manifest_layout(tmp_path):
    src = tmp_path / "drug_list.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("drugs.tsv", "D:1\taspirin\n")
    stamp = datetime(2024, 6, 2, tzinfo=timezone.utc).timestamp()
    os.utime(src, (stamp, stamp))
    man = FX.fetch_source(
        src.as_uri(), str(tmp_path / "zone"), "drugs", extract=True
    )
    assert man["source_version"] == "6_2_2024"
    assert man["path"].endswith(os.path.join("drugs", "6_2_2024", "drug_list.zip"))
    assert [os.path.basename(e) for e in man["extracted"]] == ["drugs.tsv"]


def test_cli_fetch_subcommand(tmp_path, capsys):
    from orion_spark import cli

    src = tmp_path / "edges.tsv.gz"
    with gzip.open(src, "wt") as fh:
        fh.write("".join(f"S:{i}\trelated_to\tO:{i}\n" for i in range(6)))
    rc = cli.main([
        "fetch", "--url", src.as_uri(), "--landing", str(tmp_path / "zone"),
        "--source-id", "tsv_src", "--extract", "--split-lines", "4",
    ])
    assert rc == 0
    man = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert man["source_id"] == "tsv_src"
    assert len(man["extracted"]) == 1 and len(man["splits"]) == 2


def test_fetch_parse_normalize_merge_end_to_end(spark, http_root, tmp_path):
    """The VERDICT r5 'first thing a real user hits': point the engine at a
    live (stub) HTTP source and run the whole ingest — fetch the archive,
    stage the member, parse TSV rows into KGX edges, normalize node ids
    through a lookup map, merge. Every tier is the production code path:
    sources/fetch.py -> sources/readers.py -> operators/normalize.py ->
    operators/merge.py."""
    from pyspark.sql import functions as F

    from orion_spark.operators.merge import merge_edges
    from orion_spark.operators.normalize import normalize_edges

    root, base = http_root
    with zipfile.ZipFile(root / "assoc.zip", "w") as zf:
        zf.writestr(
            "assoc.tsv",
            "subject\tpredicate\tobject\n"
            "OLD:1\tbiolink:related_to\tOLD:2\n"
            "OLD:1\tbiolink:related_to\tOLD:2\n"
            "OLD:3\tbiolink:affects\tOLD:2\n",
        )
    man = FX.fetch_source(
        f"{base}/assoc.zip", str(tmp_path / "zone"), "assoc", extract=True
    )
    staged = man["extracted"][0]

    raw = (
        spark.read.option("header", True).option("sep", "\t").csv(staged)
        .withColumn("primary_knowledge_source", F.lit("infores:assoc"))
        .withColumn("_source_ordinal", F.lit(0))
    )
    norm_map = spark.createDataFrame(
        [("OLD:1", ["NEW:1"]), ("OLD:2", ["NEW:2"]), ("OLD:3", ["NEW:3"])],
        ["original_id", "normalized_ids"],
    )
    normalized = normalize_edges(raw, norm_map)
    merged = merge_edges(normalized)
    rows = {(r.subject, r.object): r for r in merged.collect()}
    assert set(rows) == {("NEW:1", "NEW:2"), ("NEW:3", "NEW:2")}
    assert all(len(r.id) == 32 for r in rows.values())


# ---------------------------------------------------------------------------
# session-gated HTTP (orion/utils.py:260-301 pull_via_http_session_gate)
# ---------------------------------------------------------------------------

@pytest.fixture()
def gated_server():
    """A stub source site: /gate?ticket=42 sets a session cookie; /data.tsv
    403s without it. /page.html serves HTML to exercise the content-type
    check."""
    from http.server import BaseHTTPRequestHandler
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            parsed = urlparse(self.path)
            if parsed.path == "/gate":
                if parse_qs(parsed.query).get("ticket") != ["42"]:
                    self.send_response(400)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Set-Cookie", "session=opened; Path=/")
                self.send_header("Content-Length", "0")
                self.end_headers()
            elif parsed.path in ("/data.tsv", "/page.html"):
                if "session=opened" not in (self.headers.get("Cookie") or ""):
                    self.send_response(403)
                    self.end_headers()
                    return
                body = (b"S:1\trelated_to\tO:1\n" if parsed.path == "/data.tsv"
                        else b"<html>gate</html>")
                ctype = ("text/tab-separated-values"
                         if parsed.path == "/data.tsv" else "text/html")
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_http_session_gate(gated_server, tmp_path):
    base = gated_server
    # without the gate visit the source 403s
    with pytest.raises(FX.FetchError):
        FX.fetch_http(f"{base}/data.tsv", str(tmp_path / "plain"))
    # gate visit collects the cookie, download succeeds atomically
    path, n = FX.fetch_http_session_gate(
        f"{base}/data.tsv", str(tmp_path / "zone"),
        gate_url=f"{base}/gate", gate_params={"ticket": "42"},
        expected_content_type="text/tab-separated-values",
    )
    assert open(path).read() == "S:1\trelated_to\tO:1\n"
    assert n == len("S:1\trelated_to\tO:1\n")
    # idempotent: second call keeps the landed file, transfers nothing
    _, n2 = FX.fetch_http_session_gate(
        f"{base}/data.tsv", str(tmp_path / "zone"),
        gate_url=f"{base}/gate", gate_params={"ticket": "42"},
    )
    assert n2 == 0
    # bad gate params -> gate 400s -> FetchError, no partial left behind
    with pytest.raises(FX.FetchError):
        FX.fetch_http_session_gate(
            f"{base}/data.tsv", str(tmp_path / "zone2"),
            gate_url=f"{base}/gate", gate_params={"ticket": "wrong"},
        )
    assert not list((tmp_path / "zone2").glob("*.part"))
    # content-type mismatch (gate-failure HTML page) -> FetchError
    with pytest.raises(FX.FetchError, match="content type"):
        FX.fetch_http_session_gate(
            f"{base}/page.html", str(tmp_path / "zone3"),
            gate_url=f"{base}/gate", gate_params={"ticket": "42"},
            expected_content_type="text/tab-separated-values",
        )


def test_cli_fetch_gate_flags(gated_server, tmp_path, capsys, monkeypatch):
    from orion_spark import cli

    # version probe HEADs the file URL, which is gated too — the stub's
    # BaseHTTPRequestHandler has no do_HEAD, so stub the version out
    monkeypatch.setattr(
        "orion_spark.sources.fetch.http_modified_version", lambda *a, **k: "1_2_2024"
    )
    rc = cli.main([
        "fetch", "--url", f"{gated_server}/data.tsv",
        "--landing", str(tmp_path / "zone"), "--source-id", "gated",
        "--gate-url", f"{gated_server}/gate", "--gate-param", "ticket=42",
        "--expect-content-type", "text/tab-separated-values",
    ])
    assert rc == 0
    man = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert man["source_version"] == "1_2_2024"
    assert open(man["path"]).read().startswith("S:1")
