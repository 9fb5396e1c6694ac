"""S9: driver-side fetch layer — download sources to the landing zone.

Parity surface: the reference's retrieval helpers
(orion/utils.py:47-303) — FTP and HTTP pulls with skip-if-present
semantics, mtime-derived source-version strings (orion/utils.py:86-121
``get_ftp_file_date`` and :184-195 ``get_http_file_modified_date``),
gz/tar/zip staging, and line-splitting of non-splittable archive members.

Design notes (Spark-first, not a translation):

- Fetching is DRIVER-SIDE by contract (SURVEY §2 S9): at 100 TB the
  downloads land on shared storage once per source version; executors only
  ever read the landed files. Nothing here touches a SparkSession.
- Downloads are ATOMIC (``.part`` + ``os.replace``) and IDEMPOTENT (an
  existing non-empty target short-circuits), so a crashed fetch never
  leaves a half-file where the content-addressed pipeline would trust it.
- ``split_text_member`` exists because gzip is not a splittable codec: a
  50 GB ``.gz`` source is ONE Spark input partition. Splitting at fetch
  time re-enables scan parallelism for such sources; splittable formats
  (plain text, bzip2, parquet) should be landed unsplit and left to
  Spark's own partitioning.
- ``file://`` URLs work throughout (urllib handles them natively), which
  is also how the tests drive the layer hermetically.
"""

from __future__ import annotations

import gzip
import os
import shutil
import tarfile
import zipfile
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from ftplib import FTP
from urllib import request
from urllib.parse import urlparse

_BLOCK = 128 * 1024
# a few public sources refuse the default urllib agent; the reference ships
# a browser-ish header for the same reason (orion/utils.py:224)
_HEADERS = {"User-Agent": "Mozilla/5.0 (X11; Linux x86_64)"}


class FetchError(RuntimeError):
    """Retrieval failure (reference: GetDataPullError, orion/utils.py:31)."""


def _version_string(dt: datetime, exclude_day: bool = False) -> str:
    """The reference's date-derived source-version format: ``M_D_YYYY``
    (or ``M_YYYY`` with exclude_day), no zero padding
    (orion/utils.py:112-117, 193)."""
    if exclude_day:
        return f"{dt.month}_{dt.year}"
    return f"{dt.month}_{dt.day}_{dt.year}"


def http_modified_version(url: str, exclude_day: bool = False) -> str:
    """Source version from the URL's Last-Modified (orion/utils.py:184-195).

    ``file://`` URLs use the file's mtime so local fixtures version the
    same way as live sources.
    """
    try:
        parsed = urlparse(url)
        if parsed.scheme == "file":
            mtime = os.path.getmtime(request.url2pathname(parsed.path))
            dt = datetime.fromtimestamp(mtime, tz=timezone.utc)
        else:
            req = request.Request(url, headers=_HEADERS, method="HEAD")
            with request.urlopen(req, timeout=60) as resp:
                dt = parsedate_to_datetime(resp.headers["Last-Modified"])
        return _version_string(dt, exclude_day)
    except Exception as exc:
        raise FetchError(f"modified-date probe failed for {url}: {exc}") from exc


def ftp_modified_version(
    host: str, ftp_dir: str, ftp_file: str, exclude_day: bool = False
) -> str:
    """Source version from the FTP MDTM timestamp (orion/utils.py:86-121)."""
    try:
        with FTP(host, timeout=60) as ftp:
            ftp.login()
            ftp.cwd(ftp_dir)
            code, _, stamp = ftp.voidcmd(f"MDTM {ftp_file}").partition(" ")
            if code != "213":
                raise FetchError(f"MDTM response code {code}")
            dt = datetime.strptime(stamp.strip()[:14], "%Y%m%d%H%M%S")
        return _version_string(dt, exclude_day)
    except FetchError:
        raise
    except Exception as exc:
        raise FetchError(
            f"modified-date probe failed for ftp://{host}{ftp_dir}/{ftp_file}: {exc}"
        ) from exc


def fetch_http(
    url: str, data_dir: str, saved_file_name: str | None = None
) -> tuple[str, int]:
    """Stream a URL into the landing zone (orion/utils.py:197-257).

    Idempotent: an existing non-empty target is kept (returns 0 bytes
    transferred). Atomic: data lands in ``<target>.part`` and is renamed
    only on success. Returns (path, bytes_transferred).
    """
    name = saved_file_name or url.rstrip("/").rsplit("/", 1)[-1]
    os.makedirs(data_dir, exist_ok=True)
    target = os.path.join(data_dir, name)
    if os.path.exists(target) and os.path.getsize(target) > 0:
        return target, 0
    part = target + ".part"
    n = 0
    try:
        req = request.Request(url, headers=_HEADERS)
        with request.urlopen(req, timeout=300) as resp, open(part, "wb") as out:
            while True:
                buf = resp.read(_BLOCK)
                if not buf:
                    break
                out.write(buf)
                n += len(buf)
        os.replace(part, target)
    except Exception as exc:
        if os.path.exists(part):
            os.remove(part)
        raise FetchError(f"download failed for {url}: {exc}") from exc
    return target, n


def fetch_http_session_gate(
    url: str,
    data_dir: str,
    gate_url: str,
    gate_params: dict | None = None,
    expected_content_type: str | None = None,
    saved_file_name: str | None = None,
) -> tuple[str, int]:
    """Gated HTTP pull (orion/utils.py:260-301 ``pull_via_http_session_gate``):
    some source sites set session cookies from a JSP/download gate page
    before allowing direct file access. Visit ``gate_url`` first (with
    optional query params), carry the cookies it sets into the streamed
    download, and land the file under the same atomic (``.part`` +
    ``os.replace``) + idempotent (existing non-empty target short-circuits)
    contract as :func:`fetch_http`. ``expected_content_type`` rejects a
    gate-failure HTML page masquerading as the file. Returns
    (path, bytes_transferred)."""
    import http.cookiejar
    from urllib.parse import urlencode

    name = saved_file_name or url.rstrip("/").rsplit("/", 1)[-1]
    os.makedirs(data_dir, exist_ok=True)
    target = os.path.join(data_dir, name)
    if os.path.exists(target) and os.path.getsize(target) > 0:
        return target, 0
    jar = http.cookiejar.CookieJar()
    opener = request.build_opener(request.HTTPCookieProcessor(jar))
    gate = gate_url + ("?" + urlencode(gate_params) if gate_params else "")
    part = target + ".part"
    n = 0
    try:
        with opener.open(request.Request(gate, headers=_HEADERS), timeout=60):
            pass  # the visit only exists to collect session cookies
        with opener.open(
            request.Request(url, headers=_HEADERS), timeout=300
        ) as resp, open(part, "wb") as out:
            ctype = resp.headers.get("Content-Type")
            if expected_content_type and ctype != expected_content_type:
                raise FetchError(
                    f"unexpected content type {ctype!r} retrieving {url} "
                    f"(expected {expected_content_type!r})"
                )
            while True:
                buf = resp.read(_BLOCK)
                if not buf:
                    break
                out.write(buf)
                n += len(buf)
        os.replace(part, target)
    except Exception as exc:
        if os.path.exists(part):
            os.remove(part)
        if isinstance(exc, FetchError):
            raise
        raise FetchError(f"gated download failed for {url}: {exc}") from exc
    return target, n


def fetch_ftp(
    host: str, ftp_dir: str, ftp_files: list[str], data_dir: str
) -> int:
    """Pull files from an FTP directory, skipping non-empty existing ones
    (orion/utils.py:123-181). Returns the number of files now present."""
    os.makedirs(data_dir, exist_ok=True)
    done = 0
    try:
        with FTP(host, timeout=300) as ftp:
            ftp.login()
            ftp.cwd(ftp_dir)
            for name in ftp_files:
                target = os.path.join(data_dir, name)
                if not (os.path.exists(target) and os.path.getsize(target) > 0):
                    part = target + ".part"
                    with open(part, "wb") as out:
                        ftp.retrbinary(f"RETR {name}", out.write)
                    os.replace(part, target)
                done += 1
    except Exception as exc:
        raise FetchError(f"ftp pull failed for {host}{ftp_dir}: {exc}") from exc
    return done


def _safe_join(out_dir: str, member: str) -> str:
    """Refuse path traversal out of the extraction dir."""
    dest = os.path.realpath(os.path.join(out_dir, member))
    root = os.path.realpath(out_dir)
    if not (dest == root or dest.startswith(root + os.sep)):
        raise FetchError(f"archive member escapes extraction dir: {member}")
    return dest


def extract_archive(
    archive_path: str, out_dir: str, members: list[str] | None = None
) -> list[str]:
    """Stage archive contents into ``out_dir``: .zip, .tar[.gz|.bz2], and
    single-member .gz (the staging half of orion/utils.py:305-353 that
    parsers otherwise each reimplement). Returns the extracted paths,
    skipping members that already exist non-empty."""
    os.makedirs(out_dir, exist_ok=True)
    out: list[str] = []
    lower = archive_path.lower()
    if lower.endswith(".zip"):
        with zipfile.ZipFile(archive_path) as zf:
            names = members or [i.filename for i in zf.infolist() if not i.is_dir()]
            for name in names:
                dest = _safe_join(out_dir, name)
                if not (os.path.exists(dest) and os.path.getsize(dest) > 0):
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    with zf.open(name) as src, open(dest, "wb") as fh:
                        shutil.copyfileobj(src, fh, _BLOCK)
                out.append(dest)
    elif lower.endswith((".tar", ".tar.gz", ".tgz", ".tar.bz2")):
        with tarfile.open(archive_path) as tf:
            infos = [
                i
                for i in tf.getmembers()
                if i.isfile() and (members is None or i.name in members)
            ]
            for info in infos:
                dest = _safe_join(out_dir, info.name)
                if not (os.path.exists(dest) and os.path.getsize(dest) > 0):
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    with tf.extractfile(info) as src, open(dest, "wb") as fh:
                        shutil.copyfileobj(src, fh, _BLOCK)
                out.append(dest)
    elif lower.endswith(".gz"):
        name = members[0] if members else os.path.basename(archive_path)[:-3]
        dest = _safe_join(out_dir, name)
        if not (os.path.exists(dest) and os.path.getsize(dest) > 0):
            with gzip.open(archive_path, "rb") as src, open(dest, "wb") as fh:
                shutil.copyfileobj(src, fh, _BLOCK)
        out.append(dest)
    else:
        raise FetchError(f"unsupported archive format: {archive_path}")
    return out


def split_text_member(
    path: str, out_dir: str, lines_per_file: int = 500_000
) -> list[str]:
    """Split a landed text file into numbered chunks
    (orion/utils.py:355-433 splits inside-zip members; here the member is
    staged first via extract_archive, keeping one splitter for every
    archive kind). The point at scale: a non-splittable compressed source
    scans as ONE Spark partition; pre-split chunks restore parallelism.
    """
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.basename(path)
    out: list[str] = []
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as fh:
        chunk: list[str] = []
        idx = 1
        for line in fh:
            chunk.append(line)
            if len(chunk) >= lines_per_file:
                dest = os.path.join(out_dir, f"{base}.{idx}")
                with open(dest, "w", encoding="utf-8") as of:
                    of.writelines(chunk)
                out.append(dest)
                idx += 1
                chunk = []
        if chunk:
            dest = os.path.join(out_dir, f"{base}.{idx}")
            with open(dest, "w", encoding="utf-8") as of:
                of.writelines(chunk)
            out.append(dest)
    return out


def fetch_source(
    url: str,
    landing_root: str,
    source_id: str,
    saved_file_name: str | None = None,
    extract: bool = False,
    gate_url: str | None = None,
    gate_params: dict | None = None,
    expected_content_type: str | None = None,
) -> dict:
    """One-call landing-zone ingest: derive the mtime source version,
    download into ``<landing_root>/<source_id>/<version>/``, optionally
    stage archive members next to it. ``gate_url`` switches to the
    session-gated pull (cookie-setting gate visit first; see
    :func:`fetch_http_session_gate`). Returns a manifest dict — the shape
    the pipeline's SourceResolver producers consume."""
    version = http_modified_version(url)
    data_dir = os.path.join(landing_root, source_id, version)
    if gate_url:
        path, n = fetch_http_session_gate(
            url, data_dir, gate_url, gate_params=gate_params,
            expected_content_type=expected_content_type,
            saved_file_name=saved_file_name,
        )
    else:
        path, n = fetch_http(url, data_dir, saved_file_name)
    manifest = {
        "source_id": source_id,
        "source_version": version,
        "url": url,
        "path": path,
        "bytes": n,
    }
    if extract:
        manifest["extracted"] = extract_archive(
            path, os.path.join(data_dir, "extracted")
        )
    return manifest
