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
