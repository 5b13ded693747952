"""HTTP → landed-JSON extractor in front of the JSON scan (EP3 front
end).

Reference behavior: ``scripts/ingest_api_data.py:4-20`` fetches
``http://api:8000/users`` with ``requests``, validates the response,
and lands the payload as a JSON file that the bronze job then reads
with an enforced schema (``api_bronze_ingestion.py:12-26``).

Spark-first framing: extraction is an *edge* concern — one small
driver-side fetch per source endpoint, never per-row work — so this
stays deliberately outside the DataFrame plan. The landed file is the
contract; everything downstream is ``read_json(schema=...)`` and fully
distributed.

The transport is injectable so the chain is testable offline
(``file://`` URLs or a fake fetcher); the default transport is stdlib
``urllib`` with bounded retries, no extra dependencies.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import urllib.request
from typing import Callable

Fetch = Callable[[str], bytes]


def urllib_fetch(timeout: float = 30.0) -> Fetch:
    """Default transport: stdlib urllib. Supports http(s):// and
    file:// URLs (the latter is how offline tests exercise the chain).
    """

    def fetch(url: str) -> bytes:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            # file:// responses carry status=None — treat as success
            status = getattr(resp, "status", None) or 200
            if status >= 400:
                raise IOError(f"HTTP {status} fetching {url}")
            return resp.read()

    return fetch


def extract_api_json(
    url: str,
    landing_path: str,
    fetch: Fetch | None = None,
    retries: int = 3,
    backoff_s: float = 1.0,
    validate: bool = True,
) -> str:
    """Fetch ``url``, validate the payload is JSON, and land it
    atomically at ``landing_path`` (tmp-file + rename, so a crashed
    extract never leaves a half-written landing file and re-runs are
    idempotent — the reference's overwrite-the-staging-file semantics,
    ``ingest_api_data.py:10-16``, made safe).

    Returns the landed path. Raises after ``retries`` failed attempts
    (the reference raises on any request error).
    """
    if fetch is None:
        fetch = urllib_fetch()
    last: Exception | None = None
    for attempt in range(retries):
        try:
            raw = fetch(url)
            if validate:
                json.loads(raw)  # reject non-JSON payloads before landing
            break
        except Exception as e:  # noqa: BLE001 — transport-agnostic retry
            last = e
            if attempt + 1 < retries:
                time.sleep(backoff_s * (2**attempt))
    else:
        raise IOError(f"extract failed for {url} after {retries} tries") from last

    os.makedirs(os.path.dirname(landing_path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(landing_path) or ".", suffix=".tmp"
    )
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(raw)
        os.replace(tmp, landing_path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return landing_path


def extract_and_read(
    spark,
    url: str,
    landing_path: str,
    schema,
    fetch: Fetch | None = None,
    **read_options,
):
    """The full EP3 front end: fetch → land → schema-enforced JSON scan.

    Mirrors the reference chain ``ingest_api_data.py`` →
    ``api_bronze_ingestion.py:12-26`` as one call.
    """
    from data_lakehouse_project_spark.sources.readers import read_json

    landed = extract_api_json(url, landing_path, fetch=fetch)
    return read_json(spark, landed, schema=schema, **read_options)
