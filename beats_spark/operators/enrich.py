"""Enrichment: broadcast-join lookup processors.

The reference's enrichers are all row → small-dimension cached lookups
(add_process_metadata/add_docker_metadata/add_kubernetes_metadata —
SURVEY.md §2.5); none is a relational join of two event streams. The
Spark-native form is an explicit ``F.broadcast`` left join: the dim
table ships to every executor once (the reference refreshes a
process-local cache), the fact side never shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .actions import Processor


@dataclass
class BroadcastLookup(Processor):
    """Left-join a small dimension table, broadcast to all executors.

    Mirrors add_*_metadata processors (e.g.
    libbeat/processors/add_process_metadata/add_process_metadata.go:107
    — pid → cached process info). A missing dim row leaves the new
    columns NULL, like a cache miss leaves the event unenriched.
    """

    dim: DataFrame
    on: Sequence[str]
    prefix: str = ""

    def apply(self, df, guard=None):
        if guard is not None:
            raise NotImplementedError("enrich under a when: guard is not supported")
        dim = self.dim
        if self.prefix:
            for c in dim.columns:
                if c not in self.on:
                    dim = dim.withColumnRenamed(c, f"{self.prefix}{c}")
        return df.join(F.broadcast(dim), on=list(self.on), how="left")


@dataclass
class DnsEnrich(Processor):
    """dns processor analog (libbeat/processors/dns/dns.go:42,79).

    The reference reverse-looks-up a field through a TTL-bounded cache
    (~500 eps uncached — libbeat/docs/processors-using.asciidoc:1257).
    The 100 TB-safe restatement is the same shape as every other
    enricher: resolve the DISTINCT values once into a dimension table,
    broadcast-join it back — the network cost scales with cardinality,
    not row count. ``resolver`` maps a batch of names to addresses; the
    default is a deterministic stub (this sandbox has no DNS), swap in
    a real resolver callable in production. ``action`` mirrors the
    reference: "replace" overwrites the field, "append" fills a new
    column.
    """

    field: str
    target: str = "dns_resolved"
    action: str = "append"
    resolver: object = None  # Callable[[list[str]], list[str | None]]
    #: driver-side dim build is only safe for bounded name cardinality
    #: (the reference's cache makes the same assumption); exceeding it
    #: raises instead of silently OOMing the driver
    max_names: int = 100_000

    @staticmethod
    def _stub_resolver(names: list) -> list:
        # deterministic fake: hash-derived 10.x.y.z per name
        import hashlib

        out = []
        for n in names:
            h = hashlib.md5(str(n).encode()).digest()
            out.append(f"10.{h[0]}.{h[1]}.{h[2]}")
        return out

    def apply(self, df, guard=None):
        if guard is not None:
            raise NotImplementedError("dns under a when: guard is not supported")
        resolver = self.resolver or self._stub_resolver
        spark = df.sparkSession
        names = [
            r[0]
            for r in df.select(self.field).where(
                F.col(self.field).isNotNull()
            ).distinct().limit(self.max_names + 1).collect()
        ]
        if len(names) > self.max_names:
            raise ValueError(
                f"dns: > {self.max_names} distinct values in {self.field!r};"
                " resolve via a precomputed dim table instead"
            )
        addrs = resolver(names)
        dim = spark.createDataFrame(
            list(zip(names, addrs)) or [(None, None)],
            f"{self.field} string, {self.target} string",
        )
        out = df.join(F.broadcast(dim), on=self.field, how="left")
        if self.action == "replace":
            out = out.drop(self.field).withColumnRenamed(self.target, self.field)
        return out


def dim_roles(spark) -> DataFrame:
    """Built-in role metadata dim (FIXTURES.md §2)."""
    rows = [
        ("user", "human", 1),
        ("assistant", "agent", 2),
        ("system", "control", 3),
        ("tool", "agent", 2),
    ]
    return spark.createDataFrame(rows, "role string, role_group string, priority int")


def dim_tools(spark) -> DataFrame:
    """Built-in tool metadata dim (FIXTURES.md §2)."""
    rows = [
        ("bash", "shell", "high", "infra"),
        ("search", "retrieval", "low", "platform"),
        ("edit", "fs", "medium", "infra"),
        ("none", "none", "none", "none"),
    ]
    return spark.createDataFrame(
        rows, "tool string, tool_family string, risk_level string, owner string"
    )
