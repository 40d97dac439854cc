"""Thread-pool parallel executor with the pre/main/post state machine.

Mirrors the reference's executor (reference: projects/adapter/src/fal/
dbt/planner/executor.py:61-178): groups run on a ThreadPoolExecutor;
within a group, pre-hooks run first — a pre-hook failure SKIPS the main
task but post-hooks STILL run (the reference's FutureGroup state
machine, tasks.py:249-276); the group's status is the worst status seen.

Spark note: each group's main task submits Spark jobs from its thread —
Spark's scheduler interleaves them; set ``spark.scheduler.mode=FAIR``
for long mixed workloads.
"""

from __future__ import annotations

import traceback
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

from dbt_fal_spark.plans.schedule import FAILURE, SUCCESS, Scheduler, TaskGroup


def _run_group(group: TaskGroup, context: dict) -> int:
    status = SUCCESS
    pre_failed = False
    for hook in group.pre_hooks:
        if _run_task(hook, context) != SUCCESS:
            pre_failed = True
            status = FAILURE
            break
    if not pre_failed and group.task is not None:
        if _run_task(group.task, context) != SUCCESS:
            status = FAILURE
    # post-hooks always run (reference tasks.py state machine)
    for hook in group.post_hooks:
        if _run_task(hook, context) != SUCCESS:
            status = FAILURE
    return status


def _run_task(task, context: dict) -> int:
    try:
        result = task.execute(context)
        return SUCCESS if (result is None or result == SUCCESS) else FAILURE
    except Exception:
        context.setdefault("errors", []).append(traceback.format_exc())
        return FAILURE


def parallel_executor(
    scheduler: Scheduler, context: dict, threads: int = 4, fail_fast: bool = False
) -> None:
    """Run groups as dependencies allow. ``fail_fast`` (dbt --fail-fast):
    after the first failure, stop LAUNCHING new groups — in-flight groups
    finish (their results are real), everything not yet started is marked
    skipped via the scheduler's transitive-skip machinery."""
    failed = False
    with ThreadPoolExecutor(max_workers=max(1, threads)) as pool:
        futures = {}
        while not scheduler.is_done or futures:
            for group in scheduler.iter_available_groups():
                if fail_fast and failed:
                    scheduler.skip(group)
                    continue
                futures[pool.submit(_run_group, group, context)] = group
            if not futures:
                if scheduler.is_done:
                    break
                # nothing in flight AND nothing launchable AND not done:
                # the scheduler state machine is wedged (should be
                # impossible — cycles are rejected at DAG build, failures
                # transitively skip dependents). Fail loudly rather than
                # busy-spin this loop at 100% CPU forever.
                raise RuntimeError(
                    "executor deadlock: no runnable groups, none in flight, "
                    "scheduler not done"
                )
            done, _ = wait(list(futures), return_when=FIRST_COMPLETED)
            for fut in done:
                group = futures.pop(fut)
                result = fut.result()
                if result != SUCCESS:
                    failed = True
                scheduler.finish(group, result)
