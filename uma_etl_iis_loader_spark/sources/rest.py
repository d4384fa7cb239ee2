"""REST ingestion source (SURVEY.md §2.1 S1-S3).

The reference fetches entity lists and per-entity schedules from a REST
API with bounded concurrency (semaphore=5, `iis_etl/client.py:9,31`),
retry ×5 exponential backoff 2-20s (`iis_etl/client.py:25-29`), and a
120s timeout. Here the same contract is split into:

- ``RestSource``: driver-side fetch of the SMALL entity-list endpoints
  (S2) — dimension payloads are KBs; fetching them on the driver and
  parallelizing afterwards is the right boundary (the reference does the
  same single-process fetch).
- ``fetch_manifest``: the per-entity fan-out (S3) as a DISTRIBUTED
  ``mapInPandas`` over a manifest DataFrame of (entity_name, entity_type,
  request) rows — at 100k+ entities the fetch itself needs cluster
  parallelism; each task applies the same retry/backoff policy.

Both take an injectable ``fetcher(url) -> str`` so tests run without a
network (and this container has none); the default uses urllib from the
standard library.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TIMEOUT_S = 120.0  # iis_etl/client.py:17
DEFAULT_RETRIES = 5  # iis_etl/client.py:25-29
BACKOFF_MIN_S = 2.0
BACKOFF_MAX_S = 20.0


def _default_fetcher(url: str) -> str:
    from urllib.request import urlopen

    with urlopen(url, timeout=DEFAULT_TIMEOUT_S) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def fetch_with_retry(
    url: str,
    fetcher: Callable[[str], str] | None = None,
    retries: int = DEFAULT_RETRIES,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """Retry ×retries with exponential backoff 2→20s (matches
    `iis_etl/client.py:25-29`)."""
    fetcher = fetcher or _default_fetcher
    delay = BACKOFF_MIN_S
    last: Exception | None = None
    for attempt in range(retries):
        try:
            return fetcher(url)
        except Exception as exc:  # noqa: BLE001 — transient-source boundary
            last = exc
            if attempt < retries - 1:
                sleep(delay)
                delay = min(delay * 2, BACKOFF_MAX_S)
    raise last  # type: ignore[misc]


class RestSource:
    """Driver-side entity-list source → DataFrame (S1/S2)."""

    def __init__(
        self,
        spark: SparkSession,
        base_url: str,
        fetcher: Callable[[str], str] | None = None,
    ):
        self.spark = spark
        self.base_url = base_url.rstrip("/")
        self.fetcher = fetcher

    def load_list(self, endpoint: str, schema) -> DataFrame:
        """GET a JSON-array endpoint, land it as a typed DataFrame.

        Landing through ``spark.createDataFrame(..., schema)`` with an
        explicit schema — field-by-field defensive coercion happens in the
        transform layer (normalize kit), mirroring the reference's split
        between client and logic (`iis_etl/client.py:38-57` vs
        `iis_etl/logic.py:23-50`).
        """
        body = fetch_with_retry(f"{self.base_url}/{endpoint}", self.fetcher)
        rows = json.loads(body)
        if isinstance(rows, dict):
            rows = [rows]
        return self.spark.createDataFrame(rows, schema)


DEFAULT_MAX_CONCURRENCY = 5  # iis_etl/client.py:9,31 / config.py:7


def fetch_manifest(
    manifest: DataFrame,
    url_col: str = "url",
    fetcher: Callable[[str], str] | None = None,
    retries: int = DEFAULT_RETRIES,
    max_concurrency: int | None = DEFAULT_MAX_CONCURRENCY,
) -> DataFrame:
    """Distributed per-entity fetch (S3): manifest rows in, raw payload
    rows out. Errors don't poison the batch — failed rows land with a
    NULL payload and the error string (the Spark analogue of the
    reference's per-entity savepoint rollback,
    `iis_etl/logic.py:416-424`).

    CLUSTER-WIDE concurrency is bounded by ``max_concurrency`` (default
    5, the reference's politeness contract — its asyncio semaphore at
    `iis_etl/client.py:9,31`): the manifest is repartitioned to exactly
    that many partitions and each task fetches its partition SERIALLY
    (mapInPandas drains batches sequentially inside one Python worker),
    so at most ``max_concurrency`` requests are ever in flight no matter
    how many executor slots the cluster has. Without the cap, a
    1000-slot cluster would open 1000 concurrent connections against an
    API sized for 5. Pass ``None`` to opt out explicitly (e.g. when the
    upstream is a bulk-rated internal gateway); peak in-flight then
    equals the scheduler's task parallelism.
    """
    import pandas as pd

    if max_concurrency is not None:
        if max_concurrency < 1:
            raise ValueError(f"max_concurrency must be >= 1, got {max_concurrency}")
        manifest = manifest.repartition(max_concurrency)
    other_cols = [c for c in manifest.columns if c != url_col]
    schema = (
        ", ".join(f"{c} string" for c in other_cols)
        + f", {url_col} string, payload string, fetch_error string"
    )

    def fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errors = [], []
            for url in pdf[url_col]:
                try:
                    payloads.append(fetch_with_retry(url, fetcher, retries))
                    errors.append(None)
                except Exception as exc:  # noqa: BLE001
                    payloads.append(None)
                    errors.append(str(exc)[:500])
            out = pdf.copy()
            out["payload"] = payloads
            out["fetch_error"] = errors
            yield out

    return manifest.mapInPandas(fetch_batch, schema)
