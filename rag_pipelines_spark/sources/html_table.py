"""HTML-table scan (S1) and per-URL deep-scrape enrichment (S2).

The reference fetches one FDA listing page and loops `<tr>` rows
(fda_watcher.py:274-355), then GETs each row's URL for the full text
(fda_watcher.py:110-268). Spark shape:

* listing pages arrive as a DataFrame of (url, html) — one row per page
  (from a landing zone, a crawl table, or `fetch_pages`);
  `parse_html_tables` explodes each page into table rows JVM-side-adjacent
  (stdlib HTMLParser inside mapInPandas — Arrow-batched, one parser per
  batch, scales with page count);
* deep-scrape is `fetch_enrich`: mapInPandas with a per-partition
  transport (session reuse = the reference's requests.Session pattern),
  injectable so tests and air-gapped runs use a deterministic fake.

Retry/backoff (T4, fda_watcher.py:253-262) lives inside the transport;
Spark task retries cover node failure.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROW_SCHEMA = (
    "page_url string, row_idx int, title string, description string, "
    "date string, href string"
)


class _TableRowExtractor(HTMLParser):
    """Collect per-<tr> cell texts and first link href in document order."""

    def __init__(self) -> None:
        super().__init__()
        self.rows: list[tuple[list[str], str]] = []
        self._cells: list[str] | None = None
        self._buf: list[str] = []
        self._href = ""
        self._in_td = False

    def handle_starttag(self, tag, attrs):
        if tag == "tr":
            self._cells, self._href = [], ""
        elif tag in ("td", "th") and self._cells is not None:
            self._in_td, self._buf = True, []
        elif tag == "a" and self._in_td and not self._href:
            self._href = dict(attrs).get("href", "") or ""

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._in_td:
            self._cells.append("".join(self._buf).strip())
            self._in_td = False
        elif tag == "tr" and self._cells is not None:
            if self._cells:
                self.rows.append((self._cells, self._href))
            self._cells = None

    def handle_data(self, data):
        if self._in_td:
            self._buf.append(data)


def _parse_page(url: str, html: str) -> list[dict]:
    p = _TableRowExtractor()
    p.feed(html or "")
    out = []
    for i, (cells, href) in enumerate(p.rows):
        if len(cells) < 3:  # structural row filter, ref: fda_watcher.py:300-305
            continue
        out.append(
            {
                "page_url": url,
                "row_idx": i,
                "title": cells[0],
                "description": cells[1] if len(cells) > 1 else "",
                "date": cells[2] if len(cells) > 2 else "",
                "href": href,
            }
        )
    return out


def parse_html_tables(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html) pages -> one row per qualifying `<tr>` (>=3 cells).

    ref: fda_watcher.py:274-355 (row loop at 300-339). mapInPandas: Arrow
    batches in, stdlib parser per row, rows out — N pages to M rows with no
    driver involvement.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                r
                for url, html in zip(pdf[url_col], pdf[html_col])
                for r in _parse_page(url, html)
            ]
            yield pd.DataFrame(
                rows,
                columns=["page_url", "row_idx", "title", "description", "date", "href"],
            )

    return pages.mapInPandas(run, schema=ROW_SCHEMA)


Transport = Callable[[str], str]


def fake_transport(url: str) -> str:
    """Deterministic offline page body (tests / air-gapped runs)."""
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return f"FETCHED:{h}"


def fetch_enrich(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "text",
    transport: Transport | None = None,
    min_len: int = 0,
) -> DataFrame:
    """Per-URL deep-scrape column append (S2), mapInPandas.

    ref: fda_watcher.py:110-268 — session reuse becomes per-partition
    transport construction; the `len > 50` acceptance gate
    (fda_watcher.py:223-227) maps to `min_len`. The transport owns
    retry/backoff and pacing (T3/T4).
    """
    tx = transport or fake_transport
    cols = df.columns
    schema = ", ".join(f"{name} {dtype}" for name, dtype in df.dtypes)
    schema += f", {out_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init: one transport/session for all rows in the task
        session_tx = tx
        for pdf in batches:
            fetched = pdf[url_col].map(lambda u: session_tx(u) if u else "")
            if min_len:
                fetched = fetched.where(fetched.str.len() > min_len, "")
            yield pdf.assign(**{out_col: fetched})[cols + [out_col]]

    return df.mapInPandas(run, schema=schema)


def retrying_transport(
    inner: Transport,
    max_retries: int = 3,
    base_delay: float = 1.0,
    sleep=None,
) -> Transport:
    """T4: retry with exponential backoff around any transport.

    ref: fda_watcher.py:45-47,253-262 — 3 attempts, delay doubling per
    attempt, only retrying transient (connection-level) errors. `sleep` is
    injectable so tests run without wall-clock waits. Spark task retries
    cover machine-level failure above this.
    """
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep

    def fetch(url: str) -> str:
        last: Exception | None = None
        for attempt in range(max_retries):
            try:
                return inner(url)
            except (ConnectionError, TimeoutError) as e:
                last = e
                if attempt < max_retries - 1:
                    do_sleep(base_delay * (2**attempt))
        raise last  # type: ignore[misc]

    return fetch
