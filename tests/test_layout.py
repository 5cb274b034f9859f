"""Z-order layout + zone-map skipping (operators/layout.py).

Oracle parity runs in tests/test_oracle_parity.py; these pin the
semantics the parity hash can't see: the interleave is the real
Morton code, pruning is sound (never skips a file containing a
match), and Z-order strictly beats the time layout on the
two-dimensional predicate.
"""

from __future__ import annotations

from streamlit_flink_demo_spark.plans import REGISTRY, load_all

load_all(exposed_only=False)


def _morton(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_z_expression_is_the_morton_code(spark):
    from streamlit_flink_demo_spark.operators.layout import _z_sql

    cases = [(0, 0), (255, 0), (0, 255), (255, 255), (16, 96), (31, 159),
             (1, 2), (170, 85)]
    df = spark.createDataFrame(cases, "a int, b int").selectExpr(
        "a", "b", f"({_z_sql(spark_dialect=True)}) AS z"
    )
    for r in df.collect():
        assert r.z == _morton(r.a, r.b), (r.a, r.b, r.z)


def test_zorder_skips_more_and_pruning_is_sound(spark, sf_dir):
    rows = {
        r.layout: r
        for r in REGISTRY["events_zorder_skipping"]
        .fn.__wrapped__(spark, sf_dir)
        .collect()
    }
    t, zo = rows["time"], rows["zorder"]
    # both layouts hold the whole table and agree on the true matches
    assert t.n_rows_total == zo.n_rows_total
    assert t.rows_matched == zo.rows_matched > 0
    # pruning soundness: a scan reading only the zone-map-selected
    # files must still see every matching row
    assert t.rows_read >= t.rows_matched
    assert zo.rows_read >= zo.rows_matched
    # the point of the operator: Z-order prunes strictly more files
    # (rows tie at sf0.001 where 1000 rows leave most z-files empty;
    # at sf0.01 the row win is ~4.5x and at sf0.1 ~7.7x — SCALE.md)
    assert zo.files_read < t.files_read
    assert zo.rows_read <= t.rows_read
