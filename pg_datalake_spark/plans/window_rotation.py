"""Post-window re-registrations for rotated-out singles (r11).

The r11 window rotation merged lake02+lake07 and lake04+lake06 into
two suites to free driver-window slots for the ClickBench and TPC-DS
long-tail suites. The four singles stay individually registered HERE —
imported after the window modules in ``plans.load_all()``, so they
keep their standalone oracle rows in the local parity gate and the
full exact sweep without occupying window slots.
"""

from __future__ import annotations

from pg_datalake_spark.plans import lakeops, suites
from pg_datalake_spark.plans.registry import register

register("lake02_partition_metadata_delete", oracle=lakeops.LAKE02_ORACLE)(
    lakeops.lake02
)
register("lake04_update_agg", oracle=lakeops.LAKE04_ORACLE)(lakeops.lake04)
register("lake06_merge", oracle=lakeops.LAKE06_ORACLE)(lakeops.lake06)
register("lake07_add_files", oracle=lakeops.LAKE07_ORACLE)(lakeops.lake07)
# r12: the x09 window slot widened to the x-curation suite; the
# standalone row re-registers here for the local gate + full sweep
register("x09_weighted_sample", oracle=suites.X09_ORACLE)(
    suites.x09_weighted_sample
)
