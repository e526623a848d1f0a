"""Driver-contract registry invariants (round-4: the driver records only
the FIRST 50 queries() entries and hashes values after sorting columns by
name, so registry shape is load-bearing)."""


def test_registry_is_exactly_50_with_oracle_parity():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) == 50, (
        f"queries() has {len(qs)} entries — the driver records only the "
        "first 50; consolidate (merge composed queries) instead of "
        "appending past the cap"
    )
    assert set(qs) == set(oracles), (
        "queries()/oracle_sql() key mismatch: "
        f"{set(qs) ^ set(oracles)}"
    )


def test_entry_callables_and_oracles_are_wellformed():
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        assert callable(fn), name
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
