"""Output-contract guard: the driver's correctness gate hashes query
outputs value-by-value, so every output column must be hash-stable
across engines — bigint or string only (floats drift in the last ulp,
timestamps differ in dtype resolution). This test fails the build if a
future query slips a fragile type into its output schema."""

HASH_STABLE = {"bigint", "string"}


def test_all_query_outputs_are_hash_stable(spark):
    import __spark_entry__ as ent

    bad = {}
    for name, fn in ent.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        fragile = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if f.dataType.simpleString() not in HASH_STABLE
        ]
        if fragile:
            bad[name] = fragile
    assert not bad, f"hash-fragile output columns: {bad}"


# Queries the contract sanctions as rows-only (non-SQL-expressible ops):
# each must carry pytest value-level guarantees instead of a DuckDB oracle.
ROWS_ONLY = {
    # numpy transformer encoder stack — no SQL replays attention; value
    # guarantees live in tests/test_encoder.py (slow-path equivalence,
    # batch/partition invariance, BIOSE legality).
    "mention_model_neural",
}


def test_every_query_has_an_oracle(spark):
    import __spark_entry__ as ent

    qs, oras = ent.queries(), ent.oracle_sql()
    missing = sorted(set(qs) - set(oras) - ROWS_ONLY)
    assert not missing, f"queries without oracles (weaker rows-only check): {missing}"
    stale = sorted(ROWS_ONLY - set(qs))
    assert not stale, f"ROWS_ONLY entries no longer registered: {stale}"
