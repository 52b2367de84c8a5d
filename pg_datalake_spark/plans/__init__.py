"""Query library: every operator from SURVEY.md §2, as (Spark fn, oracle SQL) pairs."""

from pg_datalake_spark.plans import registry  # noqa: F401


def load_all() -> None:
    """Import all query modules so their @register decorators run."""
    from pg_datalake_spark.plans import (  # noqa: F401
        clickbench,
        funcs_coverage,
        lakeops,
        llmops,
        multimodal_q,
        relational,
        sources_streaming,
        tpch,
    )
