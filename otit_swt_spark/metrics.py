"""Execution-metric helpers shared by the bench and scaling harnesses:
per-stage shuffle-write bytes from the live AppStatusStore (what the UI
would read — the UI itself is disabled in the session factory), keyed by
stage id so deltas are immune to store eviction between snapshots."""

from __future__ import annotations


def stage_shuffle_writes(spark) -> dict[int, int]:
    """{stageId: shuffleWriteBytes} for every retained stage."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm, gw = sc._jvm, sc._gateway
    stages = store.stageList(jvm.java.util.ArrayList(), False, False,
                             gw.new_array(jvm.double, 0),
                             jvm.java.util.ArrayList())
    return {int(stages.apply(i).stageId()):
            int(stages.apply(i).shuffleWriteBytes())
            for i in range(stages.size())}


def shuffle_write_delta(spark, pre: dict[int, int]) -> int:
    """Shuffle-write bytes of the stages that ran AFTER the ``pre``
    snapshot. The AppStatusStore retains only ``spark.ui.retainedStages``
    stages (default 1000) and a totals diff silently under-counts — or
    goes negative — when eviction drops pre-snapshot stages between the
    two reads; summing only stage ids above the pre-snapshot maximum is
    immune to eviction of OLD stages, and eviction of the measured
    query's own stages is caught by the retention-window assertion (a
    single entry never runs 1000 stages)."""
    post = stage_shuffle_writes(spark)
    max_pre = max(pre, default=-1)
    new_ids = [i for i in post if i > max_pre]
    retained_cap = int(spark.conf.get("spark.ui.retainedStages", "1000"))
    assert len(new_ids) < retained_cap, (
        f"query ran {len(new_ids)} stages, >= the {retained_cap}-stage "
        f"retention window — per-stage byte accounting would under-count")
    return sum(post[i] for i in new_ids)
