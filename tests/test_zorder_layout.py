"""Z-order clustering + zone-map data skipping (io/layout.py) — the D3
secondary-index substitute: multi-column locality from one sort, per-file
min/max pruning from parquet's own footers."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from spark_signals.io import layout as L


def test_morton_interleave_bit_layout(spark):
    """Bit b of column i lands at position b*ncols + i — pinned on hand
    values: q0=0b101, q1=0b011 → bit-pairs from the LSB are (q0.b0=1 →
    pos0, q1.b0=1 → pos1), (q0.b1=0, q1.b1=1 → pos3), (q0.b2=1 → pos4,
    q1.b2=0), so the key is 0b011011 = 27."""
    row = spark.range(1).select(
        L.zorder_key([F.lit(0b101).cast("bigint"), F.lit(0b011).cast("bigint")], bits=3).alias("k")
    )
    assert row.first()["k"] == 0b011011
    con = duckdb.connect()
    sql = L.sql_zorder_key(["5", "3"], bits=3)
    assert con.execute(f"SELECT {sql}").fetchone()[0] == 0b011011


def test_zorder_locality_beats_linear_order(spark):
    """On a 2-D grid, consecutive Morton keys stay spatially close: every
    file of a Morton-sorted 16x16 grid split into 16 files covers a 4x4
    block (max per-file span 3 in BOTH dims), while row-major order gives
    files spanning the full 15-wide second dimension."""
    grid = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("bigint").alias("y")
    )
    keyed = grid.withColumn(
        "zkey", L.zorder_key([F.col("x"), F.col("y")], bits=4)
    ).toPandas()
    keyed["zfile"] = keyed["zkey"].rank(method="first").sub(1).floordiv(16)
    spans = keyed.groupby("zfile").agg(
        x_span=("x", lambda s: s.max() - s.min()),
        y_span=("y", lambda s: s.max() - s.min()),
    )
    assert int(spans["x_span"].max()) == 3 and int(spans["y_span"].max()) == 3
    rowmajor = keyed.sort_values(["y", "x"]).reset_index(drop=True)
    rowmajor["file"] = rowmajor.index // 16
    rspans = rowmajor.groupby("file").agg(x_span=("x", lambda s: s.max() - s.min()))
    assert int(rspans["x_span"].max()) == 15


def _duck(df_pd):
    con = duckdb.connect()
    con.register("documents", df_pd)
    return con


def test_zonemap_cross_engine_and_pruning_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = (
        L.zorder_zonemap(docs)
        .toPandas()
        .sort_values(["layout", "file_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    b = (
        con.execute(L.sql_zorder_zonemap())
        .fetchdf()
        .sort_values(["layout", "file_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[b.columns], b, check_dtype=False)
    # zone maps partition the corpus exactly, in both layouts
    n_docs = docs.count()
    per_layout = a.groupby("layout").n_rows.sum()
    assert set(per_layout) == {n_docs}
    # the pruning claim itself: the Z-order layout scans strictly fewer
    # files AND strictly fewer rows than ingestion order for the canned
    # (lang, n_chars-band) predicate, and skips most of the table
    z = a[a.layout == "zorder"]
    n = a[a.layout == "ingest"]
    z_files, n_files = int(z.would_scan.sum()), int(n.would_scan.sum())
    z_rows = int(z[z.would_scan].n_rows.sum())
    n_rows = int(n[n.would_scan].n_rows.sum())
    assert 0 < z_files < n_files
    assert 0 < z_rows < n_rows
    assert z_files <= len(z) // 4  # skips >= 3/4 of the files


def test_zonemap_never_loses_a_matching_row(spark):
    """Safety over selectivity: every row matching the predicate lives in
    a file flagged would_scan (zone pruning may over-scan, never
    under-scan)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    zm = L.zorder_zonemap(docs).toPandas()
    matching = docs.filter(
        (F.col("lang") == "de") & F.col("n_chars").between(150, 250)
    ).count()
    assert matching > 0  # predicate is non-vacuous on the corpus
    for layout in ("zorder", "ingest"):
        zones = zm[zm.layout == layout]
        scanned_rows = int(zones[zones.would_scan].n_rows.sum())
        assert scanned_rows >= matching, layout


def test_zonemap_plan_stays_jvm_side(spark):
    """The whole chain is shift/mask/aggregate built-ins — no Python
    stage anywhere in the physical plan (the repo's batch-path rule)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = L.zorder_zonemap(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_write_zordered_lands_tight_parquet_footers(spark, tmp_path):
    """The production writer's layout is real: per-file parquet footer
    min/max stats for the clustered columns are tight enough that the
    canned predicate prunes most files with NO engine cooperation beyond
    reading footers (pyarrow here, standing in for any scan planner)."""
    import pyarrow.parquet as pq

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    coded = docs.withColumn(
        "lang_code",
        (F.ascii(F.substring("lang", 1, 1)) * 256 + F.ascii(F.substring("lang", 2, 1))).cast("bigint"),
    )
    out = str(tmp_path / "zorded")
    L.write_zordered(coded, out, ["n_chars", "lang_code"], n_files=16)
    ds = pq.ParquetDataset(out)
    zones = []
    for frag in ds.fragments:
        md = frag.metadata
        mins = {"n_chars": None, "lang_code": None}
        maxs = {"n_chars": None, "lang_code": None}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name in mins and c.statistics is not None:
                    s = c.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        zones.append((mins, maxs))
    assert len(zones) > 4
    code = ord("d") * 256 + ord("e")
    scan = [
        1
        for mins, maxs in zones
        if mins["lang_code"] <= code <= maxs["lang_code"]
        and mins["n_chars"] <= 250
        and maxs["n_chars"] >= 150
    ]
    assert 0 < sum(scan) <= len(zones) // 2  # footers alone prune >= half


def test_read_pruned_skips_files_and_loses_no_rows(spark, tmp_path):
    """The D3 read path end to end: write Z-ordered → prune files from
    footer zones → read survivors → exact predicate re-applied. Same
    rows as the unpruned filtered read, from a fraction of the files."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    coded = docs.withColumn(
        "lang_code",
        (F.ascii(F.substring("lang", 1, 1)) * 256 + F.ascii(F.substring("lang", 2, 1))).cast("bigint"),
    )
    out = str(tmp_path / "z")
    L.write_zordered(coded, out, ["n_chars", "lang_code"], n_files=16)
    code = ord("d") * 256 + ord("e")
    ranges = {"n_chars": (150, 250), "lang_code": (code, code)}
    pruned = L.read_pruned(spark, out, ranges)
    full = spark.read.parquet(out).filter(
        F.col("n_chars").between(150, 250) & (F.col("lang_code") == code)
    )
    assert sorted(r["doc_id"] for r in pruned.collect()) == sorted(
        r["doc_id"] for r in full.collect()
    )
    assert full.count() > 0  # non-vacuous predicate
    # the pruned plan scans a strict subset of the table's files
    zones = L.zone_map_from_footers(out, ["n_chars", "lang_code"])
    kept = {f for f in pruned.inputFiles()}
    assert 0 < len(kept) <= len(zones) // 2
    # an out-of-range predicate prunes EVERYTHING and still returns a
    # well-formed empty frame
    nothing = L.read_pruned(spark, out, {"n_chars": (10**6, 10**7)})
    assert nothing.count() == 0


def test_string_column_zones_decode_and_prune(spark, tmp_path):
    """Parquet footer stats for string columns surface as bytes in
    pyarrow; the zone map must hand back str so string-range predicates
    prune correctly (lexicographic, same as Spark's BETWEEN)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "s")
    # layout sorted BY the string column so its zones are tight
    docs.repartitionByRange(8, "lang").sortWithinPartitions("lang").write.mode(
        "overwrite"
    ).parquet(out)
    zones = L.zone_map_from_footers(out, ["lang"])
    assert all(isinstance(z["min_lang"], str) for z in zones)
    pruned = L.read_pruned(spark, out, {"lang": ("de", "de")})
    full = spark.read.parquet(out).filter(F.col("lang") == "de")
    assert sorted(r["doc_id"] for r in pruned.collect()) == sorted(
        r["doc_id"] for r in full.collect()
    )
    assert 0 < len(pruned.inputFiles()) < len(zones)


def test_zone_registry_lane_survives_stale_and_delta(spark, tmp_path):
    """The persisted-registry lane under the incremental-index contract:
    (1) registry-planned reads match footer-planned reads; (2) a STALE
    registry (appended batch, delta not yet run) loses no rows — the
    unregistered files scan conservatively; (3) the delta registers
    exactly the new files, appends commute (re-run = 0), and pruning
    then skips non-intersecting new files too."""

    def coded(df):
        return df.withColumn(
            "lang_code",
            (
                F.ascii(F.substring("lang", 1, 1)) * 256
                + F.ascii(F.substring("lang", 2, 1))
            ).cast("bigint"),
        )

    docs = coded(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    table = str(tmp_path / "t")
    reg = str(tmp_path / "reg")
    L.write_zordered(docs, table, ["n_chars", "lang_code"], n_files=8)
    n0 = L.write_zone_registry(spark, table, reg, ["n_chars", "lang_code"])
    assert n0 == len(L.zone_map_from_footers(table, ["n_chars"]))
    code = ord("d") * 256 + ord("e")
    ranges = {"n_chars": (150, 250), "lang_code": (code, code)}

    def rows(df):
        return sorted(r["doc_id"] for r in df.collect())

    expect = rows(
        spark.read.parquet(table).filter(
            F.col("n_chars").between(150, 250) & (F.col("lang_code") == code)
        )
    )
    assert expect and rows(L.read_pruned_registered(spark, table, reg, ranges)) == expect

    # append a batch of matching docs WITHOUT updating the registry:
    # stale-registry reads must still see them (conservative scan)
    extra = docs.limit(40).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    extra.write.mode("append").parquet(table)
    expect2 = rows(
        spark.read.parquet(table).filter(
            F.col("n_chars").between(150, 250) & (F.col("lang_code") == code)
        )
    )
    assert len(expect2) > len(expect)
    assert rows(L.read_pruned_registered(spark, table, reg, ranges)) == expect2

    # delta: exactly the appended files register; re-running appends none
    added = L.zone_registry_delta(spark, table, reg, ["n_chars", "lang_code"])
    assert added > 0
    assert L.zone_registry_delta(spark, table, reg, ["n_chars", "lang_code"]) == 0
    assert spark.read.parquet(reg).count() == n0 + added
    assert rows(L.read_pruned_registered(spark, table, reg, ranges)) == expect2


def test_all_null_row_group_does_not_break_zone_map(spark, tmp_path):
    """A parquet file can mix an all-NULL row group (statistics object
    present, has_min_max False, min/max None) with stats-bearing ones on
    a nullable zone column; the footer walk must skip the stat-less
    group instead of comparing None with a value, and every pruned-read
    face built on it must keep returning exact rows (NULL never matches
    a range predicate, in the zone map or in the re-applied filter)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path / "nullable"
    out.mkdir()
    # row_group_size=4 → first group all-NULL in v, second group has stats
    t = pa.table(
        {
            "doc_id": pa.array(range(8), type=pa.int64()),
            "v": pa.array([None] * 4 + [10, 20, 30, 40], type=pa.int64()),
        }
    )
    pq.write_table(t, str(out / "part-0.parquet"), row_group_size=4)
    # a second file fully outside the probe range, prunable
    t2 = pa.table(
        {
            "doc_id": pa.array(range(8, 12), type=pa.int64()),
            "v": pa.array([900, 910, 920, 930], type=pa.int64()),
        }
    )
    pq.write_table(t2, str(out / "part-1.parquet"), row_group_size=4)

    zones = L.zone_map_from_footers(str(out), ["v"])
    by_file = {z["file"].rsplit("/", 1)[-1]: z for z in zones}
    assert by_file["part-0.parquet"]["min_v"] == 10  # NULL group skipped
    assert by_file["part-0.parquet"]["max_v"] == 40
    assert by_file["part-1.parquet"]["min_v"] == 900

    pruned = L.read_pruned(spark, str(out), {"v": (15, 35)})
    assert sorted(r["doc_id"] for r in pruned.collect()) == [5, 6]
    assert len(pruned.inputFiles()) == 1  # part-1 pruned

    # the registry lane tolerates the same footers
    reg = str(tmp_path / "reg")
    assert L.write_zone_registry(spark, str(out), reg, ["v"]) == 2
    assert L.zone_registry_delta(spark, str(out), reg, ["v"]) == 0
    got = L.read_pruned_registered(spark, str(out), reg, {"v": (15, 35)})
    assert sorted(r["doc_id"] for r in got.collect()) == [5, 6]


def test_all_null_file_scans_conservatively(spark, tmp_path):
    """A file whose zone column is entirely NULL has no min/max at all:
    its zones stay None and pruning must SCAN it (zones only remove
    certainly-disjoint work), with the exact re-applied predicate then
    dropping the NULL rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path / "allnull"
    out.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "v": pa.array([None, None], type=pa.int64())}),
        str(out / "a.parquet"),
    )
    pq.write_table(
        pa.table({"doc_id": pa.array([2, 3], type=pa.int64()),
                  "v": pa.array([5, 6], type=pa.int64())}),
        str(out / "b.parquet"),
    )
    zones = L.zone_map_from_footers(str(out), ["v"])
    nulls = [z for z in zones if z["min_v"] is None]
    assert len(nulls) == 1
    pruned = L.read_pruned(spark, str(out), {"v": (5, 5)})
    assert [r["doc_id"] for r in pruned.collect()] == [2]
    assert len(pruned.inputFiles()) == 2  # the stat-less file scanned


def test_zonemap_null_zkey_rows_agree_cross_engine(spark):
    """A NULL n_chars (→ NULL zkey) row must land in the SAME ntile
    bucket in both engines: Spark's default NULLS FIRST is pinned to
    asc_nulls_last to match DuckDB's ASC default."""
    import duckdb

    pdf = pd.DataFrame(
        {
            "doc_id": range(24),
            "n_chars": [None if i == 5 else 100 + 7 * i for i in range(24)],
            "lang": ["de" if i % 3 == 0 else "en" for i in range(24)],
        }
    )
    pdf["n_chars"] = pdf["n_chars"].astype("Int64")
    sdf = spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None), "doc_id long, n_chars long, lang string"
    )
    a = (
        L.zorder_zonemap(sdf, n_files=4)
        .toPandas()
        .sort_values(["layout", "file_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    b = (
        con.execute(L.sql_zorder_zonemap(n_files=4))
        .fetchdf()
        .sort_values(["layout", "file_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[b.columns], b, check_dtype=False)
    # the NULL row is counted in some bucket in both engines
    assert int(a[a.layout == "zorder"].n_rows.sum()) == 24


def test_string_zone_registry_round_trips_and_prunes(spark, tmp_path):
    """The persisted registry on a raw STRING zone column: registry-planned
    reads return the same survivors as the per-query footer walk, the
    registry schema carries str min/max (not long), and the delta lane
    appends string zones for new files."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    table = str(tmp_path / "t")
    reg = str(tmp_path / "reg")
    docs.repartitionByRange(8, "lang").sortWithinPartitions("lang").write.mode(
        "overwrite"
    ).parquet(table)
    n0 = L.write_zone_registry(spark, table, reg, ["lang", "n_chars"])
    assert n0 > 0
    schema = dict(spark.read.parquet(reg).dtypes)
    assert schema["min_lang"] == "string" and schema["max_lang"] == "string"
    assert schema["min_n_chars"] == "bigint"

    ranges = {"lang": ("de", "de"), "n_chars": (0, 10**9)}
    via_reg = L.read_pruned_registered(spark, table, reg, ranges)
    via_footers = L.read_pruned(spark, table, ranges)
    assert sorted(r["doc_id"] for r in via_reg.collect()) == sorted(
        r["doc_id"] for r in via_footers.collect()
    )
    assert set(via_reg.inputFiles()) == set(via_footers.inputFiles())
    assert 0 < len(via_reg.inputFiles()) < n0  # string zones actually prune

    # delta on the string-typed registry: appended files register as str
    extra = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    extra.write.mode("append").parquet(table)
    added = L.zone_registry_delta(spark, table, reg, ["lang", "n_chars"])
    assert added > 0
    assert dict(spark.read.parquet(reg).dtypes)["min_lang"] == "string"
    expect = sorted(
        r["doc_id"]
        for r in spark.read.parquet(table)
        .filter((F.col("lang") == "de") & F.col("n_chars").between(0, 10**9))
        .collect()
    )
    assert (
        sorted(
            r["doc_id"]
            for r in L.read_pruned_registered(spark, table, reg, ranges).collect()
        )
        == expect
    )


def test_write_zordered_tiebreak_reaches_target_file_count(spark, tmp_path):
    """Spark's range partitioner cannot split one key value across
    partitions, so without a tiebreak the file count caps at the number
    of distinct Morton keys; the tiebreak column lifts the cap while
    keeping zones exactly as tight (files still cover contiguous zkey
    runs — pruning still skips most files)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "n_chars", (F.col("doc_id") % 3).alias("band")
    )
    # band has 3 distinct values; quantized zkey entropy is tiny, so a
    # 32-file request cannot be met without the tiebreak
    capped = str(tmp_path / "capped")
    L.write_zordered(docs, capped, ["band"], n_files=32)
    n_capped = len(L.zone_map_from_footers(capped, ["band"]))
    assert n_capped < 32

    tied = str(tmp_path / "tied")
    L.write_zordered(docs, tied, ["band"], n_files=32, tiebreak=["doc_id"])
    zones = L.zone_map_from_footers(tied, ["band"])
    assert len(zones) == 32
    # zones stay tight: a single-band predicate still prunes most files
    pruned = L.read_pruned(spark, tied, {"band": (1, 1)})
    full = spark.read.parquet(tied).filter(F.col("band") == 1)
    assert sorted(r["doc_id"] for r in pruned.collect()) == sorted(
        r["doc_id"] for r in full.collect()
    )
    assert 0 < len(pruned.inputFiles()) <= len(zones) // 2


def test_pruned_reads_keep_partition_columns(spark, tmp_path):
    """A by-file read drops directory-partition columns unless basePath
    anchors it (advisor r14): prune a table partitioned on _batch_id and
    both pruned readers must present the SAME schema as the unpruned
    table — including _batch_id — on the keep branch AND the
    prune-everything branch."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "n_chars", (F.col("doc_id") % 4).alias("_batch_id")
    )
    table = str(tmp_path / "p")
    docs.repartitionByRange(4, "n_chars").sortWithinPartitions(
        "n_chars"
    ).write.partitionBy("_batch_id").mode("overwrite").parquet(table)
    reg = str(tmp_path / "reg")
    L.write_zone_registry(spark, table, reg, ["n_chars"])

    full = spark.read.parquet(table)
    lo = int(docs.agg(F.min("n_chars")).first()[0])
    ranges = {"n_chars": (lo, lo + 50)}
    for got in (
        L.read_pruned(spark, table, ranges),
        L.read_pruned_registered(spark, table, reg, ranges),
    ):
        assert set(got.columns) == set(full.columns)  # _batch_id survives
        assert got.filter(F.col("_batch_id").isNotNull()).count() == got.count()
        assert got.count() == full.filter(F.col("n_chars").between(lo, lo + 50)).count()
    # empty-prune branch: same schema as the keep branch
    nothing = L.read_pruned(spark, table, {"n_chars": (10**8, 10**9)})
    assert set(nothing.columns) == set(full.columns) and nothing.count() == 0


def test_zone_registry_delta_corrupt_registry_propagates(spark, tmp_path):
    """A registry that EXISTS but cannot be read must raise, not be
    silently treated as empty (which would re-append every table file and
    duplicate registry rows — advisor r14)."""
    import pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    table = str(tmp_path / "t")
    docs.limit(50).write.parquet(table)
    reg = tmp_path / "reg"
    reg.mkdir()
    (reg / "garbage.parquet").write_bytes(b"not a parquet file at all")
    with pytest.raises(Exception):
        L.zone_registry_delta(spark, str(table), str(reg), ["n_chars"])
    # and a genuinely MISSING registry still bootstraps from empty
    fresh = str(tmp_path / "reg2")
    n = L.zone_registry_delta(spark, str(table), fresh, ["n_chars"])
    assert n == len(L._list_parquet_files(str(table)))


def test_zone_registry_refuses_type_drift(spark, tmp_path):
    """Zone-column types are validated per file (advisor r14): a table
    whose zone column changed value class across files fails the build
    with the offending file named, and a delta whose new files drift from
    the existing registry's declared types refuses the append."""
    import pytest

    table = tmp_path / "t"
    spark.createDataFrame([(1, 10)], "doc_id long, k long").write.parquet(
        str(table / "a")
    )
    spark.createDataFrame([(2, "x")], "doc_id long, k string").write.parquet(
        str(table / "b")
    )
    with pytest.raises(ValueError, match="changed value class"):
        L.write_zone_registry(spark, str(table), str(tmp_path / "reg"), ["k"])

    # delta vs an existing registry built with k: long, new files k: string
    good = tmp_path / "g"
    spark.createDataFrame([(1, 10)], "doc_id long, k long").write.parquet(str(good))
    reg = str(tmp_path / "greg")
    L.write_zone_registry(spark, str(good), reg, ["k"])
    spark.createDataFrame([(2, "x")], "doc_id long, k string").write.mode(
        "append"
    ).parquet(str(good))
    with pytest.raises(ValueError, match="mixed-type append"):
        L.zone_registry_delta(spark, str(good), reg, ["k"])
    # and a registry built on DIFFERENT cols is named, not miscast
    with pytest.raises(ValueError, match="no zones for column"):
        L.zone_registry_delta(spark, str(good), reg, ["doc_id"])
