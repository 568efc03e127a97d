"""Python DataSource for the reference's REST poll feeder (SURVEY §2.1
S1, producer.py:70-105: poll the OpenSky REST endpoint, extract the
``states`` array, emit one row per state vector).

Earlier rounds scoped S1 out as "infra feeder, not query semantics";
Spark 4's Python DataSource API closes that seam properly: the feeder
IS a table. Each poll page is an ``InputPartition``, so page fetches
parallelize across executors and Catalyst sees an ordinary scan it
can prune and push into.

The container has no network, so the default fetcher is a
deterministic fake serving OpenSky-shaped state vectors (seeded per
page — reruns are bit-identical, which is what the tests pin).
Swapping in a real ``requests.get(OPENSKY_URL)`` changes ONE method
(``_fetch_page``), never the plan — the same posture as the
multimodal codec stubs.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

REST_STATES_SCHEMA = (
    "icao24 string, callsign string, origin_country string, "
    "time_position bigint, longitude double, latitude double, "
    "velocity double, page int"
)


class RestStatesDataSource(DataSource):
    """``spark.read.format("rest_states")`` after
    ``spark.dataSource.register(RestStatesDataSource)``.

    Options: ``pages`` (poll pages = partitions, default 4),
    ``rows_per_page`` (default 50), ``epoch`` (base timestamp of the
    first poll, default 1_700_000_000; pages advance by the
    reference's 190 s cadence)."""

    @classmethod
    def name(cls) -> str:
        return "rest_states"

    def schema(self) -> str:
        return REST_STATES_SCHEMA

    def reader(self, schema) -> "RestStatesReader":
        return RestStatesReader(self.options)


class RestStatesReader(DataSourceReader):
    POLL_CADENCE_S = 190  # producer.py:105

    def __init__(self, options: dict):
        self.pages = int(options.get("pages", 4))
        self.rows_per_page = int(options.get("rows_per_page", 50))
        self.epoch = int(options.get("epoch", 1_700_000_000))

    def partitions(self):
        return [InputPartition(p) for p in range(self.pages)]

    def _fetch_page(self, page: int):
        """The network seam: replace this body with
        ``requests.get(f"{url}?...").json()["states"]`` for the real
        endpoint. The fake derives every field from (page, i) and a
        per-page seeded generator — deterministic across reruns and
        across executor placement."""
        import random

        rng = random.Random(0xC0FFEE + page)
        ts0 = self.epoch + page * self.POLL_CADENCE_S
        for i in range(self.rows_per_page):
            yield (
                f"{page:02x}{i:06x}",
                f"FLT{page}{i:04d}",
                f"country_{i % 7}",
                ts0 + (i % self.POLL_CADENCE_S),
                round(rng.uniform(-180.0, 180.0), 6),
                round(rng.uniform(-90.0, 90.0), 6),
                round(rng.uniform(0.0, 300.0), 2),
                page,
            )

    def read(self, partition: InputPartition):
        yield from self._fetch_page(partition.value)
