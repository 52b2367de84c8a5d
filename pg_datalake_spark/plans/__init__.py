"""Query library: every operator from SURVEY.md §2, as (Spark fn, oracle SQL) pairs."""

from pg_datalake_spark.plans import registry  # noqa: F401


def load_all() -> None:
    """Import all query modules so their @register decorators run.

    ORDER MATTERS: the driver verifies only the FIRST 50 registered
    queries, so the modules that make up the verified window come
    first — 22 TPC-H + 18 suites in suites.py (13 coverage merges +
    geo + TPC-DS + x09 + the r11 ClickBench and TPC-DS long-tail
    rotations) + 5 lakeops rows (lake01, the r11 lake02+lake07 and
    lake04+lake06 merges, lake05, the formats suite) + 4
    sources/streaming rows + the streaming-formats suite = exactly
    50. The four lake singles displaced by the r11 merges re-register
    AFTER the window via window_rotation (imported after
    streaming_iceberg). tests/test_registry_window.py locks this list
    against a checked-in manifest. Everything after remains
    registered for the local parity gate (tests/test_oracle_parity.py)
    and bench. Suite oracles that wrap feeder queries registered
    later (llmops/relational/geo/tpcds/clickbench) are lazy callables,
    resolved after load_all() completes — see registry._OracleDict.
    """
    from pg_datalake_spark.plans import (  # noqa: F401
        suites,
        tpch,
        lakeops,
        sources_streaming,
        streaming_iceberg,
        window_rotation,
        geo,
        clickbench,
        funcs_coverage,
        llmops,
        multimodal_q,
        relational,
        tpcds,
        streaming_extra,
        delta_q,
        sources_extra,
    )
