"""Worked parity tests for the add_*_metadata broadcast enrichers.

Reference semantics pinned here:
- add_docker_metadata.go:123-199 (CID tiers, meta fields, label dedot)
- filebeat/processor/add_kubernetes_metadata/matchers.go:79-130
  (LogPathMatcher path cases)
- add_process_metadata.go:106-129 + config.go:31-41 (first-present
  pid field, default field set, overwrite refusal)
"""

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.metadata import (
    AddDockerMetadata,
    AddKubernetesMetadata,
    AddProcessMetadata,
)

CID_A = "a" * 64
CID_B = "b" * 64


@pytest.fixture()
def docker_dim(spark):
    return spark.createDataFrame(
        [
            (CID_A, "web-1", "nginx:1.25", {"com.example.version": "2"}),
            (CID_B, "db-1", "postgres:16", {}),
        ],
        "id string, name string, image string, labels map<string,string>",
    )


def _events(spark, paths):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(paths)], "id int, `log.file.path` string"
    )


def _row(df, i=0):
    return df.orderBy("id").collect()[i].asDict()


class TestAddDockerMetadata:
    def test_source_path_index4_hits_cid(self, spark, docker_dim):
        # /var/lib/docker/containers/<cid>/<cid>-json.log → deleteEmpty
        # split index 4 = <cid> (config.go:48 comment)
        df = _events(spark, [f"/var/lib/docker/containers/{CID_A}/{CID_A}-json.log"])
        out = AddDockerMetadata(dim=docker_dim).apply(df)
        r = _row(out)
        assert r["container.id"] == CID_A
        assert r["container.name"] == "web-1"
        assert r["container.image.name"] == "nginx:1.25"

    def test_labels_dedot(self, spark, docker_dim):
        df = _events(spark, [f"/var/lib/docker/containers/{CID_A}/x.log"])
        r = _row(AddDockerMetadata(dim=docker_dim).apply(df))
        assert r["container.labels"] == {"com_example_version": "2"}

    def test_miss_leaves_row_unenriched(self, spark, docker_dim):
        df = _events(spark, [f"/var/lib/docker/containers/{'f' * 64}/x.log"])
        r = _row(AddDockerMetadata(dim=docker_dim).apply(df))
        assert r["container.id"] is None and r["container.name"] is None

    def test_match_fields_fallback(self, spark, docker_dim):
        df = spark.createDataFrame(
            [(0, None, CID_B)], "id int, `log.file.path` string, cid_field string"
        )
        out = AddDockerMetadata(dim=docker_dim, match_fields=["cid_field"]).apply(df)
        assert _row(out)["container.name"] == "db-1"

    def test_short_id_resolves_to_full_id(self, spark, docker_dim):
        df = spark.createDataFrame([(0, CID_A[:12])], "id int, cid_field string")
        out = AddDockerMetadata(
            dim=docker_dim, match_fields=["cid_field"], match_short_id=True
        ).apply(df)
        r = _row(out)
        assert r["container.id"] == CID_A  # the FULL id, like the watcher map
        assert r["container.name"] == "web-1"

    def test_pid_dim_tier(self, spark, docker_dim):
        pid_dim = spark.createDataFrame([(101, CID_B)], "pid long, cid string")
        df = spark.createDataFrame(
            [(0, None, 101)], "id int, `log.file.path` string, `process.pid` int"
        )
        out = AddDockerMetadata(dim=docker_dim, pid_dim=pid_dim).apply(df)
        assert _row(out)["container.name"] == "db-1"

    def test_join_is_broadcast(self, spark, docker_dim):
        df = _events(spark, [f"/var/lib/docker/containers/{CID_A}/x.log"])
        out = AddDockerMetadata(dim=docker_dim).apply(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


@pytest.fixture()
def k8s_dim(spark):
    return spark.createDataFrame(
        [(CID_A, "web-abc", "default"), ("pod-uid-1", "web-abc", "default")],
        "key string, `kubernetes.pod.name` string, `kubernetes.namespace` string",
    )


class TestAddKubernetesMetadata:
    def test_var_log_containers_cid_before_dot_log(self, spark, k8s_dim):
        path = f"/var/log/containers/web-abc_default_app-{CID_A}.log"
        df = _events(spark, [path])
        out = AddKubernetesMetadata(
            dim=k8s_dim, logs_path="/var/log/containers/"
        ).apply(df)
        assert _row(out)["kubernetes.pod.name"] == "web-abc"

    def test_default_logs_path_cid_after_prefix(self, spark, k8s_dim):
        df = _events(spark, [f"/var/lib/docker/containers/{CID_A}/{CID_A}-json.log"])
        out = AddKubernetesMetadata(dim=k8s_dim).apply(df)
        assert _row(out)["kubernetes.namespace"] == "default"

    def test_pod_uid_at_index5(self, spark, k8s_dim):
        df = _events(spark, ["/var/lib/kubelet/pods/pod-uid-1/volumes/x/app.log"])
        out = AddKubernetesMetadata(
            dim=k8s_dim, logs_path="/var/lib/kubelet/pods/", resource_type="pod"
        ).apply(df)
        assert _row(out)["kubernetes.pod.name"] == "web-abc"

    def test_non_matching_and_short_paths_unenriched(self, spark, k8s_dim):
        df = _events(
            spark, ["/tmp/other.log", "/var/lib/docker/containers/short.log"]
        )
        out = AddKubernetesMetadata(dim=k8s_dim).apply(df)
        rows = out.orderBy("id").collect()
        assert all(r["kubernetes.pod.name"] is None for r in rows)


@pytest.fixture()
def proc_dim(spark):
    return spark.createDataFrame(
        [(42, "nginx", "/usr/sbin/nginx", ["nginx", "-g", "daemon off;"], 1)],
        "pid long, name string, executable string, args array<string>, ppid long",
    )


class TestAddProcessMetadata:
    def test_first_present_pid_field_wins(self, spark, proc_dim):
        df = spark.createDataFrame(
            [(0, 42, 999), (1, None, 42)],
            "id int, `process.pid` int, `process.ppid` int",
        )
        out = AddProcessMetadata(
            dim=proc_dim,
            match_pids=["process.pid", "process.ppid"],
            target="proc",
            include_fields=["name", "executable", "args"],
        ).apply(df)
        r0, r1 = (_row(out, 0), _row(out, 1))
        assert r0["proc.name"] == "nginx"  # pid present and hits
        assert r1["proc.name"] == "nginx"  # pid missing → ppid tried

    def test_present_but_missing_in_dim_does_not_fall_through(self, spark, proc_dim):
        # add_process_metadata.go:109-123: the FIRST present field is
        # used; a provider miss stops resolution, it does not try ppid.
        df = spark.createDataFrame(
            [(0, 999, 42)], "id int, `process.pid` int, `process.ppid` int"
        )
        out = AddProcessMetadata(
            dim=proc_dim,
            match_pids=["process.pid", "process.ppid"],
            target="proc",
            include_fields=["name"],
        ).apply(df)
        assert _row(out)["proc.name"] is None

    def test_string_pid_accepted(self, spark, proc_dim):
        df = spark.createDataFrame([(0, "42")], "id int, pidstr string")
        out = AddProcessMetadata(
            dim=proc_dim, match_pids=["pidstr"], target="proc", include_fields=["name"]
        ).apply(df)
        assert _row(out)["proc.name"] == "nginx"

    def test_overwrite_refused_at_compile_time(self, spark, proc_dim):
        df = spark.createDataFrame([(0, 42)], "id int, `process.pid` int").withColumn(
            "proc.name", F.lit("existing")
        )
        with pytest.raises(ValueError, match="overwrite_keys"):
            AddProcessMetadata(
                dim=proc_dim, match_pids=["process.pid"], target="proc"
            ).apply(df)

    def test_unknown_include_field_rejected(self, spark, proc_dim):
        df = spark.createDataFrame([(0, 42)], "id int, `process.pid` int")
        with pytest.raises(ValueError, match="unknown include_fields"):
            AddProcessMetadata(
                dim=proc_dim, match_pids=["process.pid"], include_fields=["env"]
            ).apply(df)


class TestConfigSurface:
    def test_inline_containers_from_config(self, spark):
        from beats_spark.config import compile_processor

        proc = compile_processor(
            {
                "add_docker_metadata": {
                    "containers": [
                        {"id": CID_A, "name": "web-1", "image": "nginx:1.25",
                         "labels": {"com.example.v": "2"}},
                        {"id": CID_B, "name": "db-1", "image": "postgres:16"},
                    ]
                }
            }
        )
        df = _events(spark, [f"/var/lib/docker/containers/{CID_B}/x.log"])
        r = _row(proc.apply(df))
        assert r["container.name"] == "db-1"
        assert r["container.labels"] is None or r["container.labels"] == {}

    def test_inline_pods_from_config(self, spark):
        from beats_spark.config import compile_processor

        proc = compile_processor(
            {
                "add_kubernetes_metadata": {
                    "logs_path": "/var/log/containers/",
                    "pods": [
                        {"key": CID_A, "kubernetes.pod.name": "web-abc",
                         "kubernetes.namespace": "default"},
                    ],
                }
            }
        )
        df = _events(spark, [f"/var/log/containers/web-abc_default_app-{CID_A}.log"])
        assert _row(proc.apply(df))["kubernetes.pod.name"] == "web-abc"

    def test_inline_processes_from_config(self, spark):
        from beats_spark.config import compile_processor

        proc = compile_processor(
            {
                "add_process_metadata": {
                    "match_pids": ["process.pid"],
                    "target": "proc",
                    "include_fields": ["name", "executable"],
                    "processes": [
                        {"pid": 42, "name": "nginx", "executable": "/usr/sbin/nginx"},
                    ],
                }
            }
        )
        df = spark.createDataFrame([(0, 42)], "id int, `process.pid` int")
        r = _row(proc.apply(df))
        assert r["proc.name"] == "nginx" and r["proc.executable"] == "/usr/sbin/nginx"

    def test_missing_inventory_rejected(self, spark):
        from beats_spark.operators.metadata import AddDockerMetadata

        df = _events(spark, ["/x.log"])
        with pytest.raises(ValueError, match="inline inventory"):
            AddDockerMetadata().apply(df)


def test_process_metadata_overwrite_keys(spark):
    """overwrite_keys=True with an existing target column: a dim hit
    overwrites, a dim miss keeps the event's value, and the join must
    never leave a duplicate column name
    (add_process_metadata.go:164-167)."""
    from pyspark.sql import functions as F
    from beats_spark.operators.metadata import AddProcessMetadata

    df = spark.createDataFrame(
        [(1, 100, "old-a"), (2, 999, "old-b")],
        "id long, `process.pid` long, `process.name` string",
    )
    dim = spark.createDataFrame([(100, "nginx")], "pid long, name string")
    out = AddProcessMetadata(
        dim=dim, match_pids=["process.pid"], include_fields=["name"],
        overwrite_keys=True,
    ).apply(df)
    assert out.columns.count("process.name") == 1
    rows = {r["id"]: r["process.name"] for r in out.collect()}
    assert rows[1] == "nginx"   # dim hit overwrites
    assert rows[2] == "old-b"   # dim miss keeps the event's value
