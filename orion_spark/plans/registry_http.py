"""HTTP graph-registry tier (reference orion/graph_registry.py:1-133).

Two clients, stdlib-only (urllib — no extra deps in the runtime image):

- ``HttpGraphRegistryClient``: the reference's release-catalog protocol —
  version records per graph (cached per client), build->release version
  mapping, graph metadata by release or latest, file manifests, and
  per-file downloads whose URLs resolve from the metadata's distribution
  entries (exact-file match, then shared-directory derivation, then the
  legacy directory-style contentUrl — graph_registry.py:86-104).

- ``HttpBundleRegistry``: a drop-in replacement for
  ``pipeline.FileSystemRegistry`` (same has/fetch/publish surface, so
  ``SourceResolver``'s local -> registry -> produce ladder works
  unchanged) speaking a flat HTTP layout:
  ``{base}/{source_id}/{build_version}/<file>`` with a JSON ``_MANIFEST``
  uploaded LAST as the completeness marker — the same marker-last
  discipline as the filesystem tier, so a crashed publish is invisible
  to readers.

Everything downloads streamed (copyfileobj, 1 MiB chunks) into a .tmp
staged path with an atomic replace — a torn connection never leaves a
half-written file where a reader expects a complete one.
"""

from __future__ import annotations

import json
import os
import shutil
import urllib.error
import urllib.request


class GraphRegistryError(RuntimeError):
    pass


_CHUNK = 1024 * 1024


class HttpGraphRegistryClient:
    """Release-catalog client (graph_registry.py:16-133 semantics)."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._versions_cache: dict[str, list[dict]] = {}

    def _get_json(self, path: str):
        url = f"{self.base_url}{path}"
        try:
            with urllib.request.urlopen(url, timeout=self.timeout) as resp:
                body = resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise GraphRegistryError(
                f"Request to {url} returned HTTP {e.code}"
            ) from e
        except urllib.error.URLError as e:
            raise GraphRegistryError(
                f"Could not reach graph registry at {url}: {e}"
            ) from e
        try:
            return json.loads(body)
        except ValueError as e:
            raise GraphRegistryError(
                f"Response from {url} was not valid JSON: {e}"
            ) from e

    def get_versions(self, graph_id: str) -> list[dict]:
        """Version records ({version, build_version, release_date,
        latest}), cached for the client's lifetime."""
        if graph_id not in self._versions_cache:
            self._versions_cache[graph_id] = (
                self._get_json(f"/versions/{graph_id}") or []
            )
        return self._versions_cache[graph_id]

    def release_version_for_build_version(
        self, graph_id: str, build_version: str
    ) -> str | None:
        for record in self.get_versions(graph_id):
            if record.get("build_version") == build_version:
                return record.get("version")
        return None

    def get_graph_metadata(
        self, graph_id: str, release_version: str | None = None
    ) -> dict | None:
        if release_version:
            return self._get_json(f"/graph_metadata/{graph_id}/{release_version}")
        return self._get_json(f"/graph_metadata/{graph_id}")

    def list_files(self, graph_id: str, release_version: str) -> list[dict]:
        """File manifest; a missing manifest for a resolved version is a
        registry inconsistency -> error, not an empty list."""
        files = self._get_json(f"/files/{graph_id}/{release_version}")
        if files is None:
            raise GraphRegistryError(
                f"Registry lists no file manifest for "
                f"{graph_id}/{release_version}."
            )
        return files

    @staticmethod
    def _resolve_file_url(graph_metadata: dict, filename: str) -> str | None:
        """distribution-entry URL resolution with the reference's three
        fallbacks (graph_registry.py:86-104)."""
        content_urls = [
            entry.get("contentUrl")
            for entry in (graph_metadata.get("distribution") or [])
            if entry.get("contentUrl")
        ]
        for content_url in content_urls:  # entry naming this very file
            if content_url.rsplit("/", 1)[-1] == filename:
                return content_url
        for content_url in content_urls:  # derive the shared bundle dir
            if not content_url.endswith("/"):
                return f"{content_url.rsplit('/', 1)[0]}/{filename}"
        for content_url in content_urls:  # legacy directory-style entry
            if content_url.endswith("/"):
                return f"{content_url}{filename}"
        return None

    def download_file(
        self,
        graph_id: str,
        filename: str,
        destination_path: str,
        graph_metadata: dict,
    ) -> str:
        url = self._resolve_file_url(graph_metadata, filename)
        if not url:
            raise GraphRegistryError(
                f"No distribution.contentUrl found for {graph_id}; "
                f"cannot resolve download URL for {filename}."
            )
        os.makedirs(os.path.dirname(destination_path) or ".", exist_ok=True)
        tmp_path = destination_path + ".tmp"
        try:
            with urllib.request.urlopen(url, timeout=self.timeout) as resp:
                with open(tmp_path, "wb") as out:
                    shutil.copyfileobj(resp, out, length=_CHUNK)
        except urllib.error.HTTPError as e:
            raise GraphRegistryError(
                f"Download of {url} returned HTTP {e.code}"
            ) from e
        except urllib.error.URLError as e:
            raise GraphRegistryError(f"Download of {url} failed: {e}") from e
        os.replace(tmp_path, destination_path)
        return destination_path


class HttpBundleRegistry:
    """FileSystemRegistry-compatible bundle tier over HTTP."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _url(self, source_id: str, build_version: str, name: str) -> str:
        return f"{self.base_url}/{source_id}/{build_version}/{name}"

    def _manifest(self, source_id: str, build_version: str) -> list[str] | None:
        try:
            with urllib.request.urlopen(
                self._url(source_id, build_version, "_MANIFEST"),
                timeout=self.timeout,
            ) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise GraphRegistryError(
                f"Registry manifest request failed: HTTP {e.code}"
            ) from e
        except urllib.error.URLError as e:
            raise GraphRegistryError(f"Could not reach registry: {e}") from e

    def has_bundle(self, source_id: str, build_version: str) -> bool:
        return self._manifest(source_id, build_version) is not None

    def fetch_bundle(
        self, source_id: str, build_version: str, dest_dir: str
    ) -> bool:
        """Stream every manifest file into a staging dir, then atomically
        promote (clearing a marker-less crashed-produce leftover first —
        same discipline as the filesystem tier)."""
        from orion_spark.plans.pipeline import (
            BUNDLE_MARKER,
            _clear_stale_bundle_dir,
        )

        names = self._manifest(source_id, build_version)
        if names is None:
            return False
        staging = dest_dir + ".fetching"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        os.makedirs(staging)
        for name in names:
            target = os.path.join(staging, name)
            os.makedirs(os.path.dirname(target) or staging, exist_ok=True)
            try:
                with urllib.request.urlopen(
                    self._url(source_id, build_version, name),
                    timeout=self.timeout,
                ) as resp:
                    with open(target, "wb") as out:
                        shutil.copyfileobj(resp, out, length=_CHUNK)
            except urllib.error.URLError as e:
                shutil.rmtree(staging)
                raise GraphRegistryError(
                    f"Bundle file download failed for {name}: {e}"
                ) from e
        with open(os.path.join(staging, BUNDLE_MARKER), "w") as fh:
            fh.write(build_version)
        _clear_stale_bundle_dir(dest_dir)
        os.rename(staging, dest_dir)
        return True

    def publish_bundle(
        self, source_id: str, build_version: str, bundle_dir: str
    ) -> None:
        """PUT every bundle file, the JSON _MANIFEST last: readers treat
        manifest presence as bundle completeness, so a publish that dies
        mid-way is simply invisible (content-addressed keys make a retry
        safe)."""
        from orion_spark.plans.pipeline import BUNDLE_MARKER

        if self.has_bundle(source_id, build_version):
            return  # content-addressed: same key -> same bundle
        names = []
        for root, _dirs, files in os.walk(bundle_dir):
            for f in sorted(files):
                rel = os.path.relpath(os.path.join(root, f), bundle_dir)
                if f != BUNDLE_MARKER:  # marker is local-tier bookkeeping
                    names.append(rel)
        for name in sorted(names):
            with open(os.path.join(bundle_dir, name), "rb") as fh:
                self._put(self._url(source_id, build_version, name), fh.read())
        self._put(
            self._url(source_id, build_version, "_MANIFEST"),
            json.dumps(sorted(names)).encode(),
        )

    def _put(self, url: str, data: bytes) -> None:
        req = urllib.request.Request(url, data=data, method="PUT")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                if resp.status not in (200, 201, 204):
                    raise GraphRegistryError(
                        f"PUT {url} returned HTTP {resp.status}"
                    )
        except urllib.error.URLError as e:
            raise GraphRegistryError(f"PUT {url} failed: {e}") from e
