"""EP3 front end: HTTP fetch → land → schema-enforced JSON scan.

Replicates the reference chain ``scripts/ingest_api_data.py:4-20`` →
``api_bronze_ingestion.py:12-26`` offline: file:// URLs for the real
urllib transport, plus injected fetchers for retry/validation paths.
"""

from __future__ import annotations

import json

import pytest

from data_lakehouse_project_spark import schemas
from data_lakehouse_project_spark.sources.http_extract import (
    extract_and_read,
    extract_api_json,
)

USERS = [
    {"id": 1, "first_name": "Ada", "last_name": "L", "email": "a@x.io",
     "created_at": "2025-01-05T10:00:00Z"},
    {"id": 2, "first_name": "Bob", "last_name": "M", "email": "b@x.io",
     "created_at": "2025-01-12T11:00:00Z"},
]


def test_extract_lands_payload_via_file_url(tmp_path):
    src = tmp_path / "api_users.json"
    src.write_text(json.dumps(USERS))
    landed = extract_api_json(
        src.as_uri(), str(tmp_path / "staging" / "users.json")
    )
    assert json.loads(open(landed).read()) == USERS


def test_extract_retries_then_succeeds(tmp_path):
    calls = {"n": 0}

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return json.dumps(USERS).encode()

    landed = extract_api_json(
        "http://api:8000/users",  # never contacted — fetch is injected
        str(tmp_path / "users.json"),
        fetch=flaky,
        backoff_s=0.0,
    )
    assert calls["n"] == 3
    assert json.loads(open(landed).read()) == USERS


def test_extract_rejects_non_json_and_leaves_no_file(tmp_path):
    target = tmp_path / "users.json"
    with pytest.raises(IOError):
        extract_api_json(
            "http://api:8000/users",
            str(target),
            fetch=lambda u: b"<html>gateway error</html>",
            retries=2,
            backoff_s=0.0,
        )
    assert not target.exists()  # atomic landing: no partial file


def test_full_chain_fetch_land_schema_read(spark, tmp_path):
    src = tmp_path / "api_users.json"
    src.write_text(json.dumps(USERS))
    df = extract_and_read(
        spark,
        src.as_uri(),
        str(tmp_path / "staging" / "users.json"),
        schema=schemas.USERS,
    )
    assert df.count() == 2
    assert [f.name for f in df.schema.fields] == [
        f.name for f in schemas.USERS.fields
    ]
    assert {r.first_name for r in df.collect()} == {"Ada", "Bob"}
