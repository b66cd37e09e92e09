"""Cancellation + progress (SURVEY §2.9 T5, §4.1).

The reference interleaves cooperative cancel-flag checks and progress
callbacks through its scan loops (app.py:35-62, 89, 117, 295). Spark
equivalents: job groups for cancellation, a SparkListener-style poll of
the status tracker for progress. Both are thin driver-side wrappers —
no data-plane cost.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def job_group(spark: SparkSession, group_id: str, description: str = ""):
    """Run actions under a job group so ``cancel(spark, group_id)`` can stop
    them mid-flight — the engine's cooperative-cancellation unit."""
    sc = spark.sparkContext
    sc.setJobGroup(group_id, description, interruptOnCancel=True)
    try:
        yield
    finally:
        sc.setJobGroup("", "")


def cancel(spark: SparkSession, group_id: str) -> None:
    spark.sparkContext.cancelJobGroup(group_id)


def progress_snapshot(spark: SparkSession) -> dict:
    """Poll active stage progress (the engine's progress-bar feed)."""
    tracker = spark.sparkContext.statusTracker()
    stages = []
    for sid in tracker.getActiveStageIds():
        info = tracker.getStageInfo(sid)
        if info:
            stages.append(
                {
                    "stage_id": sid,
                    "num_tasks": info.numTasks,
                    "num_active_tasks": info.numActiveTasks,
                    "num_completed_tasks": info.numCompletedTasks,
                }
            )
    return {"active_jobs": list(tracker.getActiveJobsIds()), "stages": stages}
