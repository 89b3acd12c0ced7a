"""REST API source (reference S1-S3, S9).

Re-expresses the reference's Extractor + token flow
(ETL_Airflow/dags/utils.py:29-69; server side Rest-API/main.py:66-98)
without its weaknesses: explicit schema instead of Row-inference, token
provider injected (the reference hardcodes user/pass and auto-detects
"customers" in the URL), and a distributed fetch path for paginated APIs
(the reference collects everything on the driver).

Uses urllib from the standard library — ``requests`` is optional.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TokenProvider = Callable[[], str | None]


def fetch_json(
    url: str,
    token: str | None = None,
    timeout: float = 30.0,
    data_key: str = "data",
):
    """GET ``url`` and unwrap the reference's ``{"status":200,"data":[...]}``
    envelope (Rest-API/main.py:85-98). Raises on HTTP errors."""
    req = urllib.request.Request(url)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = json.load(resp)
    if isinstance(payload, dict) and data_key in payload:
        return payload[data_key]
    return payload


def fetch_token(
    token_url: str, username: str, password: str, timeout: float = 30.0
) -> str:
    """OAuth2 password-grant token fetch (form-encoded POST — reference
    utils.py:36-54). Credentials come from the caller/config, never
    hardcoded."""
    body = urllib.parse.urlencode(
        {"username": username, "password": password}
    ).encode()
    req = urllib.request.Request(token_url, data=body, method="POST")
    req.add_header("Content-Type", "application/x-www-form-urlencoded")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.load(resp)["access_token"]


def read_api(
    spark: SparkSession,
    url: str,
    schema: StructType,
    token_provider: TokenProvider | None = None,
) -> DataFrame:
    """Driver-side fetch → DataFrame with an explicit schema contract.

    Right for dimension-sized feeds (the reference's daily drops are
    ≤ 45 k rows). For large paginated APIs use ``read_api_paged``.
    """
    token = token_provider() if token_provider else None
    records = fetch_json(url, token=token)
    rows = [tuple(rec.get(f.name) for f in schema.fields) for rec in records]
    return spark.createDataFrame(rows, schema)


def read_api_paged(
    spark: SparkSession,
    url_for_page: Callable[[int], str],
    n_pages: int,
    schema: StructType,
    token_provider: TokenProvider | None = None,
) -> DataFrame:
    """Distributed fetch: one task per page via mapInPandas over a page-id
    range — the scale path the reference lacks (it funnels every record
    through the driver, ingestion_task.py:26-29). Executors fetch pages in
    parallel; the driver never holds the dataset."""
    import pandas as pd

    token = token_provider() if token_provider else None
    field_names = [f.name for f in schema.fields]

    def fetch_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for page in pdf["id"]:
                records = fetch_json(url_for_page(int(page)), token=token)
                yield pd.DataFrame(
                    {name: [r.get(name) for r in records] for name in field_names}
                )

    return spark.range(n_pages).mapInPandas(fetch_pages, schema=schema)
