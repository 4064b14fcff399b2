"""Hive ``key=value`` partition pruning — parity with the reference's
pruned_partition_list (physical_plan/object_store/hive_partition.rs:72)
and the PARTITIONED BY slt coverage (bigwig-tests.slt:42-52)."""


def _rows(df):
    return df.collect_arrow().to_pylist()


def test_bigwig_partitioned(session, ref_data):
    loc = ref_data("bigwig-partition")
    session.sql("CREATE EXTERNAL TABLE bw STORED AS BIGWIG_VALUE "
                f"PARTITIONED BY (sample) LOCATION '{loc}'")
    rows = _rows(session.sql(
        "SELECT * FROM bw WHERE sample = '1' AND "
        "bigwig_region_filter('1', name) = true"))
    assert len(rows) == 5
    assert all(r["sample"] == "1" for r in rows)
    counts = _rows(session.sql(
        "SELECT sample, COUNT(*) AS n FROM bw GROUP BY sample "
        "ORDER BY sample"))
    assert [(r["sample"], r["n"]) for r in counts] == [("1", 6), ("2", 6)]


def test_fasta_partitioned_prune(session, ref_data):
    loc = ref_data("fasta-partition")
    session.sql("CREATE EXTERNAL TABLE fa STORED AS FASTA "
                f"PARTITIONED BY (sample) LOCATION '{loc}'")
    rows = _rows(session.sql("SELECT COUNT(*) AS n FROM fa "
                             "WHERE sample = '2'"))
    assert rows[0]["n"] == 2
    # partition column appears after file columns in the schema
    t = session.sql("SELECT * FROM fa LIMIT 1").collect_arrow()
    assert t.schema.names[-1] == "sample"


def test_partitioned_formats_group_by(session, ref_data):
    expected = {"VCF": ("vcf-partition", 621), "GFF": ("gff-partition", 5000),
                "BAM": ("bam-partition", 61), "GTF": ("gtf-partition", 77),
                "BED": ("bed-partition", 10)}
    for fmt, (d, n) in expected.items():
        loc = ref_data(d)
        session.sql(f"CREATE EXTERNAL TABLE t_{fmt.lower()} STORED AS {fmt} "
                    f"PARTITIONED BY (sample) LOCATION '{loc}'")
        rows = _rows(session.sql(
            f"SELECT sample, COUNT(*) AS n FROM t_{fmt.lower()} "
            "GROUP BY sample ORDER BY sample"))
        assert [(r["sample"], r["n"]) for r in rows] == \
            [("1", n), ("2", n)], fmt


def test_partition_prune_no_match_is_empty(session, ref_data):
    loc = ref_data("fasta-partition")
    session.sql("CREATE EXTERNAL TABLE fa STORED AS FASTA "
                f"PARTITIONED BY (sample) LOCATION '{loc}'")
    t = session.sql("SELECT * FROM fa WHERE sample = 'nope'").collect_arrow()
    assert t.num_rows == 0
    assert "sample" in t.schema.names
