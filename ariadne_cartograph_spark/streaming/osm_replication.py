"""Continuous OSM replication (SURVEY.md §2.1 S7/T6): a Structured
Streaming pipeline that drains a directory of OsmChange ``.osc``
files — the osmosis/pyosmium replication feed osm2pgsql ``--append``
consumes in production — and maintains

1. the element stores (``nodes``/``ways`` as copy-on-write
   :class:`~..operators.merge.ParquetMergeTable`\\ s), and
2. any way-keyed derived table (geometry store, line features),
   recomputing ONLY each changeset's blast radius
   (`sources/osm_diff.py`),

all exactly-once: every per-table commit carries the table's
(txn_app, 2*batch_id / 2*batch_id+1) marks, so a crashed-and-replayed
micro-batch is a no-op. OsmChange files must apply in sequence order:
each micro-batch applies its files as ONE combined changeset collapsed
last-op-wins by the explicit (file path, in-file position) key — file
names carry the osmosis sequence number and sort lexicographically in
sequence order, so same-mtime bursts are safe; across polls the file
source delivers oldest-first.

Scale shape per batch: the diff is MBs → every join broadcasts; the
element upserts touch O(diff) buckets of the bucketed stores; the
derived recompute is O(blast radius). The one O(table) touch left is
the reverse node→way lookup — a column-pruned scan of the ways store's
(id, node_refs) probed by the broadcast diff, never shuffled; a
planet-scale deployment materializes
:func:`~..sources.osm_diff.node_way_index` bucketed at rest and
maintains it per batch to make that lookup O(diff) too.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import ParquetMergeTable
from ..sources.osm import typed_elements
from ..sources.osm_diff import (
    _OSC_COLUMNS,
    _OSC_SCHEMA,
    _iter_osc_rows,
    incremental_way_geometries,
    net_changes,
)

NODE_COLS = ["id", "lat", "lon", "tags"]
WAY_COLS = ["id", "node_refs", "tags"]


def osc_elements_from_text(
    docs: DataFrame, text_col: str = "value", path_col: str | None = None
) -> DataFrame:
    """Parse OsmChange documents carried as STRINGS (one row per file —
    ``spark.read/readStream.format("text").option("wholetext", True)``)
    into the typed diff frame. Same executor-side iterparse as
    :func:`~..sources.osm_diff.read_osc_elements`, just sourced from
    column values instead of re-opened paths — which is what a
    streaming file source hands a micro-batch. Pass ``path_col``
    (e.g. the selected ``_metadata.file_path``) so every row carries
    the (src_path, src_pos) document-order key `net_changes` collapses
    by — without it a multi-document frame has no defined cross-file
    order."""
    import io

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(len(pdf)):
                content = pdf[text_col].iloc[i]
                src = str(pdf[path_col].iloc[i]) if path_col else ""
                rows = []
                for pos, row in enumerate(
                    _iter_osc_rows(io.BytesIO(content.encode("utf-8")))
                ):
                    row["src_path"] = src
                    row["src_pos"] = pos
                    rows.append(row)
                if rows:
                    yield pd.DataFrame(rows, columns=_OSC_COLUMNS)

    return typed_elements(docs.mapInPandas(parse, schema=_OSC_SCHEMA))


class OsmReplicationPipeline:
    """Element stores + one derived way table under a changeset feed."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        derive: Callable[[DataFrame], DataFrame],
        n_buckets: int | None = 8,
    ) -> None:
        self.spark = spark
        self.derive = derive
        self.nodes = ParquetMergeTable(spark, f"{root}/nodes", key="id", n_buckets=n_buckets)
        self.ways = ParquetMergeTable(spark, f"{root}/ways", key="id", n_buckets=n_buckets)
        self.derived = ParquetMergeTable(spark, f"{root}/derived", key="id", n_buckets=n_buckets)

    def bootstrap(self, nodes: DataFrame, ways: DataFrame) -> None:
        """Seed the stores from a full import (the initial ``-c`` run)."""
        from ..sources.osm import assemble_way_geometries

        self.nodes.upsert(nodes.select(*NODE_COLS))
        self.ways.upsert(ways.select(*WAY_COLS))
        self.derived.upsert(self.derive(assemble_way_geometries(nodes, ways)))

    def apply_changeset(self, diff: DataFrame, batch_id: int) -> None:
        """One OsmChange → three exactly-once table maintenances."""
        net = net_changes(diff).localCheckpoint(eager=True)
        v_up, v_del = 2 * batch_id, 2 * batch_id + 1

        def split(kind: str, cols: list[str]):
            k = net.filter(F.col("kind") == kind)
            return (
                k.filter(F.col("op") != "delete").select(*cols),
                k.filter(F.col("op") == "delete").select("id"),
            )

        n_up, n_del = split("node", NODE_COLS)
        w_up, w_del = split("way", WAY_COLS)
        self.nodes.upsert(n_up, txn_app="osc", txn_version=v_up)
        self.nodes.delete(n_del, txn_app="osc", txn_version=v_del)
        self.ways.upsert(w_up, txn_app="osc", txn_version=v_up)
        self.ways.delete(w_del, txn_app="osc", txn_version=v_del)

        # blast-radius recompute against the UPDATED stores
        nodes_df, ways_df = self.nodes.read(), self.ways.read()
        inc = incremental_way_geometries(nodes_df, ways_df, diff)
        self.derived.upsert(self.derive(inc["rebuilt"]), txn_app="osc", txn_version=v_up)
        self.derived.delete(
            inc["deleted"].select(F.col("way_id").alias("id")),
            txn_app="osc",
            txn_version=v_del,
        )

    def run_stream(self, osc_dir: str, checkpoint_dir: str) -> None:
        """Drain ``osc_dir`` (availableNow); each micro-batch applies
        its files as ONE combined changeset in FILE-NAME order —
        osmosis sequence files sort lexicographically in sequence
        order, so a burst of changesets fetched in one poll (which
        commonly share an mtime, making the file source's
        modification-time ordering a tie) still collapses last-op-wins
        correctly via the (src_path, src_pos) key. Across polls the
        source's oldest-first delivery keeps batches in order.
        Restartable from the checkpoint with replayed batches skipped
        by the txn marks."""
        stream = (
            self.spark.readStream.format("text")
            .option("wholetext", "true")
            .load(osc_dir)
            .select("value", F.col("_metadata.file_path").alias("src"))
        )

        def _process(batch: DataFrame, batch_id: int) -> None:
            diff = osc_elements_from_text(batch, path_col="src").localCheckpoint(
                eager=True
            )
            if diff.count():
                self.apply_changeset(diff, batch_id)

        (
            stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
