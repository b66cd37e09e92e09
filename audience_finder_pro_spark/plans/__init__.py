"""Reference-pipeline layer: the two analytic programs of the reference
app re-expressed as composable DataFrame plans (SURVEY §2, §3.1-3.2).
"""

from audience_finder_pro_spark.plans.views import reddit_views
from audience_finder_pro_spark.plans.audience import discover_communities, scan_signals

__all__ = ["reddit_views", "discover_communities", "scan_signals"]
