"""Driver-contract meta-invariants: the structural properties the
per-round CORRECTNESS gate depends on, pinned so a refactor cannot
silently break the harness wiring (a missing oracle or a head typo
shows up here in seconds, not in a red driver round)."""


def _entry():
    import __spark_entry__ as e

    return e


def test_every_query_has_an_oracle_and_vice_versa():
    e = _entry()
    q, o = set(e.queries()), set(e.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_head_names_resolve_and_lead_the_dict():
    e = _entry()
    q = e.queries()
    head = e._DRIVER_CHECK_HEAD
    assert len(head) == len(set(head))
    missing = [n for n in head if n not in q]
    assert not missing, missing
    # queries() must ITERATE in head order for the driver's bounded
    # correctness pass to check the head first
    assert list(q)[: len(head)] == head


def test_head_proper_is_exactly_fifty():
    e = _entry()
    # the import-time assertion pins this too; restate it here so a
    # failure surfaces as a normal red test with context.  Fill
    # entries beyond the 50-slot head proper are optional (r12 ships
    # none); the head proper itself must be exactly 50 unique names.
    assert len(e._DRIVER_CHECK_HEAD) >= e._HEAD_PROPER_LEN
    head = e._DRIVER_CHECK_HEAD[: e._HEAD_PROPER_LEN]
    assert len(set(head)) == 50


def test_oracle_sql_is_parseable_by_duckdb():
    """Every oracle must at least PREPARE against empty views — a
    syntax error or a bad table reference fails here without running
    Spark at all."""
    import duckdb

    e = _entry()
    con = duckdb.connect()
    for t, cols in {
        "region": "r_regionkey BIGINT, r_name VARCHAR, r_comment VARCHAR",
        "nation": "n_nationkey BIGINT, n_name VARCHAR, n_regionkey BIGINT, n_comment VARCHAR",
        "customer": "c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR, c_nationkey BIGINT, c_phone VARCHAR, c_acctbal DOUBLE, c_mktsegment VARCHAR, c_comment VARCHAR",
        "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_address VARCHAR, s_nationkey BIGINT, s_phone VARCHAR, s_acctbal DOUBLE, s_comment VARCHAR",
        "part": "p_partkey BIGINT, p_name VARCHAR, p_mfgr VARCHAR, p_brand VARCHAR, p_type VARCHAR, p_size INT, p_container VARCHAR, p_retailprice DOUBLE, p_comment VARCHAR",
        "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority VARCHAR, o_clerk VARCHAR, o_shippriority INT, o_comment VARCHAR",
        "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate DATE, l_commitdate DATE, l_receiptdate DATE, l_shipinstruct VARCHAR, l_shipmode VARCHAR, l_comment VARCHAR",
        "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR",
        "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT",
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INT",
    }.items():
        con.execute(f"CREATE TABLE {t} ({cols})")
    bad = []
    hug = []
    for name, sql in e.oracle_sql().items():
        try:
            res = con.execute(sql)
            # DuckDB types result columns even on empty tables: any
            # HUGEINT output (sum() over integers promotes!) breaks
            # the driver's value canonicalization against Spark's
            # BIGINT — the recursive_cte r10 red.  Every aggregate
            # must be CAST in the oracle SQL.
            for col, ty in zip(
                [d[0] for d in res.description],
                [str(d[1]).upper() for d in res.description],
            ):
                if "HUGEINT" in ty or "INT128" in ty:
                    hug.append((name, col, ty))
            res.fetchall()
        except Exception as ex:  # noqa: BLE001
            bad.append((name, str(ex).splitlines()[0]))
    assert not bad, bad
    assert not hug, f"uncast HUGEINT oracle columns: {hug}"


def test_bench_regression_emitter(tmp_path):
    """bench._emit_regressions flags only >1.5x-and->0.15s above-floor
    slowdowns, excludes '#2' repeat-pass diagnostics, and lists
    improvements symmetrically (VERDICT r8 task 7)."""
    import json

    import bench

    stable_prev = {f"s{i}": 1.0 for i in range(5)}
    stable_new = {f"s{i}": 1.0 for i in range(5)}
    prev = tmp_path / "prev.json"
    prev.write_text(
        json.dumps(
            {
                "floor_sec": 0.03,
                "queries": {
                    "a": 1.0, "b": 0.2, "c": 0.5, "a#2": 9.9,
                    **stable_prev,
                },
            }
        )
    )
    report = tmp_path / "REGRESSIONS.md"
    bench._emit_regressions(
        str(prev),
        {
            "floor_sec": 0.05,
            "queries": {"a": 2.0, "b": 0.21, "c": 0.1, **stable_new},
        },
        report_path=str(report),
    )
    text = report.read_text()
    assert "| a |" in text            # 2x and ~1s slower -> flagged
    assert "| b |" not in text        # within thresholds
    assert "c: 0.460 (adj) -> 0.050" in text  # improvement listed
    assert "#2" not in text           # repeat passes excluded
    assert "drift factor 0.9" in text  # near-1 drift on a stable fleet


def test_bench_regression_emitter_cancels_uniform_drift(tmp_path):
    """A uniform host slowdown (everything 1.3x — the second-r9-session
    signature where the DuckDB oracle slowed identically) flags ZERO
    regressions after drift normalization."""
    import json

    import bench

    prev = tmp_path / "prev.json"
    prev.write_text(
        json.dumps(
            {
                "floor_sec": 0.0,
                "queries": {f"q{i}": 0.5 + i * 0.1 for i in range(20)},
            }
        )
    )
    report = tmp_path / "REGRESSIONS.md"
    bench._emit_regressions(
        str(prev),
        {
            "floor_sec": 0.0,
            "queries": {f"q{i}": (0.5 + i * 0.1) * 1.3 for i in range(20)},
        },
        report_path=str(report),
    )
    text = report.read_text()
    assert "Regressions: none over threshold" in text
    assert "drift factor 1.300" in text


def test_bench_regression_emitter_dominant_query_not_masked(tmp_path):
    """A single dominant query's genuine 3x regression must be flagged
    even though it moves the suite TOTAL by >2x — the median-based
    drift estimate ignores it (r9 review finding: a total-ratio
    factor let the regression normalize itself away and labeled every
    stable query an improvement)."""
    import json

    import bench

    prev = {"floor_sec": 0.0, "queries": {"big": 60.0}}
    new = {"floor_sec": 0.0, "queries": {"big": 180.0}}
    for i in range(40):
        prev["queries"][f"q{i}"] = 1.0
        new["queries"][f"q{i}"] = 1.0
    p = tmp_path / "prev.json"
    p.write_text(json.dumps(prev))
    report = tmp_path / "REGRESSIONS.md"
    bench._emit_regressions(str(p), new, report_path=str(report))
    text = report.read_text()
    assert "| big |" in text                      # the real regression
    assert "Improvements" not in text             # no phantom wins
    assert "drift factor 1.000" in text


def test_make_scale_data_preserves_structure(tmp_path):
    """The perf-only scale-up keeps FK universes intact and grows
    every fact table by the factor (BENCH_SF1 provenance)."""
    import subprocess
    import sys

    import duckdb

    out = str(tmp_path / "sf2x")
    subprocess.run(
        [
            sys.executable,
            "tools/make_scale_data.py",
            "/root/testdata/sf0.001",
            out,
            "2",
        ],
        check=True,
        capture_output=True,
    )
    con = duckdb.connect()
    src = "/root/testdata/sf0.001"
    for t, factor in [
        ("lineitem", 2), ("orders", 2), ("customer", 2), ("events", 2),
        ("documents", 2), ("embeddings", 2), ("region", 1), ("nation", 1),
    ]:
        n0 = con.execute(f"SELECT count(*) FROM '{src}/{t}.parquet'").fetchone()[0]
        n1 = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        assert n1 == factor * n0, (t, n0, n1)
    # FK integrity: every lineitem order resolves in BOTH universes
    orphans = con.execute(
        f"SELECT count(*) FROM '{out}/lineitem.parquet' l "
        f"LEFT JOIN '{out}/orders.parquet' o ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0
    # replica texts are fresh, not verbatim copies (MinHash density)
    n_docs, n_distinct = con.execute(
        f"SELECT count(*), count(DISTINCT text) FROM '{out}/documents.parquet'"
    ).fetchone()
    assert n_distinct > n_docs * 0.9
    # embeddings stay unit-norm (cosine kernels assume it)
    bad_norm = con.execute(
        f"SELECT count(*) FROM (SELECT sqrt(sum(v * v)) AS nrm FROM "
        f"(SELECT vec_id, unnest(embedding) AS v FROM '{out}/embeddings.parquet') "
        "GROUP BY vec_id) WHERE abs(nrm - 1.0) > 1e-5"
    ).fetchone()[0]
    assert bad_norm == 0
