"""The app library — ports of the reference's apps (SURVEY.md §2b).

jobcount is NOT ported: it is a non-idempotent side-effecting UDF (writes
marker files per map *invocation*, app-jobcount/src/lib.rs:18-42) whose
semantics contradict Spark's idempotent-task model. The property it tests —
no spurious re-execution in a healthy run — is owned by Spark's scheduler.
"""

from . import crash, early_exit, indexer, wc  # noqa: F401
