"""Contract-level exercise of IcebergTableIO (S2/S3) without an Iceberg
runtime: the sandbox has no iceberg-spark-runtime jar, so the class's
protocol — snapshot-summary pid sets + lineage properties, dynamic
overwritePartitions, journal-table appends, committed-pid resume — is
driven through faked Spark seams. This pins the exact calls a jar-present
deployment would make; the semantics themselves are shared with (and
value-tested through) ParquetJournalTableIO."""

import json

import pytest

from engine.checkpoint import PID_COL, CheckpointManager, IcebergTableIO


class FakeWriter:
    """Records writeTo(...).option(...).overwritePartitions()/append()."""

    def __init__(self, sink, table, rows):
        self.sink, self.table, self.rows = sink, table, rows
        self.options = {}

    def option(self, k, v):
        self.options[k] = v
        return self

    def overwritePartitions(self):
        self.sink.commits.append(
            {"table": self.table, "mode": "overwritePartitions", "options": dict(self.options)}
        )

    def append(self):
        self.sink.commits.append(
            {"table": self.table, "mode": "append", "options": dict(self.options)}
        )
        if self.table and self.table.endswith("_journal"):
            self.sink.journal_rows.extend(self.rows)


class FakeDF:
    def __init__(self, sink, table, rows=None):
        self.sink, self.table, self.rows = sink, table, rows or []

    def writeTo(self, table):
        return FakeWriter(self.sink, table, self.rows)

    # read-side chain used by count_rows: where().groupBy().agg().collect()
    def where(self, cond):
        return self

    def groupBy(self, *cols):
        return self

    def agg(self, *exprs):
        return self

    def collect(self):
        return self.rows


class FakeRow(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


class FakeSpark:
    """Just enough surface for IcebergTableIO: sql(), read.table(),
    createDataFrame()."""

    def __init__(self):
        self.commits = []
        self.snapshots = []  # rows of {"summary": {...}}
        self.journal_rows = []
        self.table_rows = []

        outer = self

        class _Read:
            def table(self, name):
                if name.endswith("_journal"):
                    return FakeDF(outer, name, outer.journal_rows)
                return FakeDF(outer, name, outer.table_rows)

        self.read = _Read()

    def sql(self, q):
        assert ".snapshots" in q  # only the snapshot-summary query is issued

        class _R:
            def __init__(self, rows):
                self._rows = rows

            def collect(self):
                return self._rows

        return _R(self.snapshots)

    def createDataFrame(self, rows, schema):
        pid, lineage, metrics = rows[0]
        return FakeDF(self, None, [
            FakeRow(partition_id=pid, lineage=lineage, metrics=metrics)
        ])


@pytest.fixture
def fake():
    return FakeSpark()


def test_write_partitions_rides_snapshot_properties(fake):
    io = IcebergTableIO(fake, "cat.db.features")
    io.write_partitions(
        FakeDF(fake, None), pids=[3, 1, 2], lineage={"code_version": "x"}
    )
    assert len(fake.commits) == 1
    c = fake.commits[0]
    assert c["table"] == "cat.db.features"
    # dynamic overwrite, never append: retries must replace orphan files
    assert c["mode"] == "overwritePartitions"
    assert c["options"]["snapshot-property.afg.partition_ids"] == "3,1,2"
    assert json.loads(c["options"]["snapshot-property.afg.lineage"]) == {
        "code_version": "x"
    }


def test_committed_partitions_unions_snapshot_summaries(fake):
    io = IcebergTableIO(fake, "cat.db.features")
    fake.snapshots = [
        FakeRow(summary={"afg.partition_ids": "0,1"}),
        FakeRow(summary={}),  # non-afg snapshot (compaction etc.) ignored
        FakeRow(summary={"afg.partition_ids": "4"}),
    ]
    assert io.committed_partitions() == {0, 1, 4}
    mgr = CheckpointManager(io, num_partitions=6)
    assert mgr.pending() == [2, 3, 5]


def test_commit_partition_appends_journal_row(fake):
    io = IcebergTableIO(fake, "cat.db.features")
    io.commit_partition(7, lineage={"a": 1}, metrics={"rows_out": 10})
    c = fake.commits[0]
    assert c["table"] == "cat.db.features_journal"
    assert c["mode"] == "append"  # metrics commit is additive, its own snapshot
    recs = io.read_journal()
    assert recs == [{"partition_id": 7, "lineage": {"a": 1}, "metrics": {"rows_out": 10}}]


def test_count_rows_covers_missing_pids(fake, spark):
    # `spark` (session fixture): count_rows builds real Column expressions,
    # which need an active SparkContext even though the fake intercepts them
    io = IcebergTableIO(fake, "cat.db.features")
    fake.table_rows = [FakeRow({PID_COL: 1, "n": 5})]
    got = io.count_rows([1, 2])
    assert got == {1: 5, 2: 0}  # absent pid reports 0, never KeyErrors
