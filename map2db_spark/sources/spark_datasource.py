"""MapsForge `.map` connector via Spark's official Python DataSource
API (pyspark.sql.datasource, Spark 4+): ``spark.read.format(
"mapsforge").load(path)`` yields the decoded feature table — the
idiomatic connector packaging of the engine's scan stack (S5-S9), so
a user plugs the reference's input format into ANY Spark job exactly
like parquet or CSV.

Planning happens on the driver (header + tile-index geometry only,
KB-scale); each InputPartition is a tile-index CHUNK, and executors
range-read their chunk's index slice, then read + decode only their
own tiles — the same distributed shape as pipeline.load_features, but
behind the standard source interface, so Spark handles scheduling,
retries, and Arrow conversion.

Filter pushdown (DataSourceReader.pushFilters):

- ``level = N`` / ``level IN (...)`` prunes whole SUBFILES at
  planning time — partitions for other zoom levels are never created,
  so their index and tile bytes are never read (the columnar
  analogue of partition pruning);
- ``ftype = '...'`` / ``ftype IN (...)`` filters rows inside the
  reader before Arrow serialization (tiles must still be decoded —
  ftype is a decode output — but non-matching rows never cross the
  Python->JVM boundary).

Everything else is reported back as unsupported, so Spark re-applies
it — pushdown here is an optimization, never a semantics change.

Reference parity: the decode kernel is the same tile_feature_rows the
pipeline uses (map2db.py:815-1077 semantics), so the connector's
output is row-identical to pipeline.load_features.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)

from map2db_spark.operators.decode import FEATURE_SCHEMA


class TileChunk(InputPartition):
    """One tile-index slice of one subfile."""

    def __init__(self, subfile_idx: int, start: int, count: int):
        self.subfile_idx = subfile_idx
        self.start = start
        self.count = count


class MapsforgeReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("mapsforge source requires a path: .load('<file.map>')")
        from map2db_spark.sources.header import read_header

        self.path = path
        # driver-side planning state: header metadata only (KB-scale,
        # picklable — it ships to executors inside the reader)
        self.header = read_header(path)
        self.chunk_entries = int(options.get("chunk_entries", 65536))
        self.level_filter: set[int] | None = None
        self.ftype_filter: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if isinstance(f, EqualTo) and col == "level":
                self.level_filter = {int(f.value)}
            elif isinstance(f, In) and col == "level":
                self.level_filter = {int(v) for v in f.value}
            elif isinstance(f, EqualTo) and col == "ftype":
                self.ftype_filter = {str(f.value)}
            elif isinstance(f, In) and col == "ftype":
                self.ftype_filter = {str(v) for v in f.value}
            else:
                yield f  # unsupported -> Spark re-applies it

    def partitions(self):
        out = []
        for i, sf in enumerate(self.header.subfiles):
            if self.level_filter is not None and sf.level not in self.level_filter:
                continue  # subfile pruned: its bytes are never read
            for start in range(0, sf.tile_count, self.chunk_entries):
                out.append(
                    TileChunk(i, start, min(self.chunk_entries, sf.tile_count - start))
                )
        if not out:
            # Spark requires >= 1 partition; an empty one yields no rows
            out.append(TileChunk(-1, 0, 0))
        return out

    def read(self, partition: TileChunk):
        if partition.subfile_idx < 0:
            return
        from map2db_spark.operators.decode import tile_feature_rows
        from map2db_spark.sources.header import _manifest_chunk_rows

        hdr = self.header
        sf = hdr.subfiles[partition.subfile_idx]
        manifest = _manifest_chunk_rows(
            self.path, partition.subfile_idx, sf, hdr.debuginfo,
            partition.start, partition.count,
        )
        keep = self.ftype_filter
        with open(self.path, "rb") as f:
            for r in manifest.itertuples(index=False):
                if r.offset == r.end_offset:
                    continue  # F3: empty tile, no byte read
                f.seek(r.offset)
                buf = f.read(r.end_offset - r.offset)
                for row in tile_feature_rows(
                    buf, int(r.level), sf.minzoom, sf.maxzoom,
                    int(r.tile_x), int(r.tile_y),
                    hdr.ptags, hdr.wtags, hdr.debuginfo, hdr.is_dbl,
                ):
                    if keep is None or row[0] in keep:
                        yield row


class MapsforgeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mapsforge"

    def schema(self) -> str:
        return FEATURE_SCHEMA

    def reader(self, schema) -> MapsforgeReader:
        return MapsforgeReader(self.options)


def register(spark) -> None:
    """Register the format for this session (idempotent) and enable
    Python-source filter pushdown (a runtime SQL conf, off by default
    in Spark 4.1; Spark refuses a reader that implements pushFilters
    while the conf is off, so the two must travel together)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(MapsforgeDataSource)
