"""Parquet test dialect: a parquet table acting as the source database.

Implements the dialect SPI surface (reference flink-cdc-base
DataSourceDialect / JdbcDataSourceDialect, §2 note after Part A) for the
driver's deterministic parquet tables: discovery, analyze, chunked
snapshot scan (A2-A5), changelog column attachment (A13/A14).

Two snapshot paths:

  scan()          — single declarative read; Catalyst parallelizes by file
                    splits and pushes filters/projections into the parquet
                    scan. This is the production-shape path at 100 TB.
  chunked_scan()  — the reference's chunk algorithm made literal: plan PK
                    ranges with ChunkPlanner, read one filtered DataFrame
                    per chunk, union. Exercises A3/A4/A5/A9 end-to-end;
                    each chunk's range predicate is pushdown-eligible, so
                    the union'd plan is N parallel range scans — the same
                    shape a chunked JDBC read has on a real database.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import (
    OP_COL,
    OP_INSERT,
    SEQ_COL,
    ChunkRange,
    SnapshotSplit,
    TableId,
)
from flink_cdc_2_3_0_src_spark.operators.changelog import append_metadata
from flink_cdc_2_3_0_src_spark.plans.chunking import (
    DEFAULT_CHUNK_SIZE,
    ChunkPlanner,
    TableAnalysis,
    spark_analyze,
)


class ParquetTableSource:
    """One captured table backed by a parquet file/dir."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        table: str,
        split_key: Optional[str] = None,
        chunk_size: int = DEFAULT_CHUNK_SIZE,
        max_chunks: Optional[int] = None,
        schema_name: Optional[str] = None,
        tenant_name: Optional[str] = None,
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.table = table
        # per-dialect identity parts (SourceConfig.schema_name /
        # tenant_name): surfaced as _schema/_tenant metadata columns
        self.schema_name = schema_name
        self.tenant_name = tenant_name
        self.table_id = TableId("testdb", schema_name, table)
        self.path = f"{sf_dir}/{table}.parquet"
        self.split_key = split_key
        self.chunk_size = chunk_size
        self.max_chunks = max_chunks
        self._raw: Optional[DataFrame] = None

    def raw(self) -> DataFrame:
        # memoized: a chunked scan derives N chunk reads + analyze from
        # this one relation; re-reading per chunk would re-list files and
        # re-read footers N times
        if self._raw is None:
            from flink_cdc_2_3_0_src_spark.io import load_table

            self._raw = load_table(self.spark, self.sf_dir, self.table)
        return self._raw

    # ---- A2: analyze ----
    def analyze(self) -> TableAnalysis:
        if self.split_key is None:
            raise ValueError(f"no split key configured for {self.table}")
        return spark_analyze(self.raw(), self.split_key)

    # ---- A4 callback: bounded next-chunk-max (ORDER BY LIMIT shape) ----
    def query_next_chunk_max(self, low):
        if not isinstance(self.split_key, str):
            return self._query_next_chunk_max_composite(tuple(low))
        rows = (
            self.raw()
            .filter(F.col(self.split_key) >= F.lit(low))
            .select(self.split_key)
            .orderBy(self.split_key)
            .limit(self.chunk_size)
            .agg(F.max(self.split_key).alias("mx"))
            .collect()
        )
        return rows[0]["mx"] if rows else None

    def _query_next_chunk_max_composite(self, low: tuple):
        """Composite-key A4: lexicographic ``(k1..kn) >= low``, ordered by
        the key columns, max = struct max of the bounded window (reference
        multi-column split-key path, StatementUtils.buildSplitScanQuery:132-188)."""
        from flink_cdc_2_3_0_src_spark.model import ChunkRange

        keys = list(self.split_key)
        pred = ChunkRange(low, None).predicate_sql(keys)
        rows = (
            self.raw()
            .filter(F.expr(pred))
            .select(*keys)
            .orderBy(*keys)
            .limit(self.chunk_size)
            .agg(F.max(F.struct(*keys)).alias("mx"))
            .collect()
        )
        mx = rows[0]["mx"] if rows else None
        return tuple(mx) if mx is not None else None

    def planner(self, **kw) -> ChunkPlanner:
        return ChunkPlanner(
            table_id=self.table_id,
            split_key=self.split_key,
            analyze=self.analyze,
            query_next_chunk_max=self.query_next_chunk_max,
            chunk_size=kw.pop("chunk_size", self.chunk_size),
            max_chunks=kw.pop("max_chunks", self.max_chunks),
            **kw,
        )

    # ---- snapshot reads ----
    def scan(self, with_metadata: bool = True) -> DataFrame:
        """Production-shape snapshot: declarative scan + changelog columns.

        Snapshot rows are op=READ→+I with op_ts=epoch 0 (reference
        RecordUtils.formatMessageTimestamp:119-147 zeroes ts_ms on
        snapshot rows; SnapshotSplitReader emits all as INSERT).
        """
        df = (
            self.raw()
            .withColumn(OP_COL, F.lit(OP_INSERT))
            .withColumn(SEQ_COL, F.lit(0).cast("long"))
        )
        if with_metadata:
            df = append_metadata(
                df,
                database="testdb",
                table=self.table,
                schema=self.schema_name,
                tenant=self.tenant_name,
            )
        return df

    def read_chunk(self, chunk: ChunkRange) -> DataFrame:
        """A5: one chunk read with a pushdown-eligible range predicate."""
        return self.raw().filter(F.expr(chunk.predicate_sql(self.split_key)))

    def chunked_scan(
        self, splits: Optional[Sequence[SnapshotSplit]] = None
    ) -> DataFrame:
        """Union of per-chunk range scans (the literal A3-A5 path)."""
        if splits is None:
            splits = self.planner().plan_splits()
        dfs = [self.read_chunk(s.range) for s in splits]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return (
            out.withColumn(OP_COL, F.lit(OP_INSERT))
            .withColumn(SEQ_COL, F.lit(0).cast("long"))
        )
