"""Scale-extension operator queries - aggregator.

Round-10 split of the former 6,200-line monolith into domain modules
(queries_ext_*.py) so the standing changed-file -> re-adjudicate rule
schedules only the touched domain's queries. Importing this module imports
every domain module (side-effect registration into registry.QUERIES/ORACLES);
registry.all_queries() is unchanged. Engine-portable determinism rules live
with each domain module: md5-based hashing (same hex both engines),
similarity rounded to 4 decimals before ranking/thresholding, Decimal sums,
microsecond-exact session gaps.
"""

from __future__ import annotations

# import order fixes registration order (cosmetic beyond the window-first 50)
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_text  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_dedup  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_similarity  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_events  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_curation  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_state  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_multimodal  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_streaming  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_pipeline  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_analytics  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_scale  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_ops  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_audit  # noqa: F401,E402
from airflow_courier_payout_ledger_pipeline_spark import queries_ext_selection  # noqa: F401,E402
