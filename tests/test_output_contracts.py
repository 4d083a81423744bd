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


# Queries the contract sanctions as rows-only (non-SQL-expressible ops).
# Empty since r4: mention_model_neural — the last member — now gates a
# value-bearing invariant summary (pinned-VALUES oracle whose golden is
# independently recomputed by tests/test_encoder.py). Kept as a set so a
# future genuinely-non-expressible op declares itself here explicitly.
ROWS_ONLY: set[str] = set()


def test_every_query_has_an_oracle(spark):
    import __spark_entry__ as ent

    qs, oras = ent.queries(), ent.oracle_sql()
    missing = sorted(set(qs) - set(oras) - ROWS_ONLY)
    assert not missing, f"queries without oracles (weaker rows-only check): {missing}"
    stale = sorted(ROWS_ONLY - set(qs))
    assert not stale, f"ROWS_ONLY entries no longer registered: {stale}"
