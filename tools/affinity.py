"""CPU-affinity binding for scaling legs: pin the WHOLE Spark tree
(driver python, JVM threads, pyspark daemons + workers) to a cpuset.

Linux sched_setaffinity is per-thread; a running JVM has hundreds of
threads and the python workers are separate processes, so binding must
enumerate /proc descendants and every tid under /proc/<pid>/task.
Threads/processes spawned AFTER binding inherit their parent thread's
mask, so re-applying once after worker spawn (warm-up) suffices.
"""

from __future__ import annotations

import os


def _children_map() -> dict[int, list[int]]:
    kids: dict[int, list[int]] = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat") as f:
                parts = f.read().split()
            ppid = int(parts[3])
        except (OSError, IndexError, ValueError):
            continue
        kids.setdefault(ppid, []).append(int(pid_s))
    return kids


def descendants(root: int) -> list[int]:
    kids = _children_map()
    out, stack = [root], [root]
    while stack:
        for c in kids.get(stack.pop(), []):
            out.append(c)
            stack.append(c)
    return out


def bind_tree(cpus: set[int], root: int | None = None) -> int:
    """Set affinity of every thread of every descendant of ``root``
    (default: this process). Returns the number of tids bound."""
    n = 0
    for pid in descendants(root or os.getpid()):
        try:
            tids = os.listdir(f"/proc/{pid}/task")
        except OSError:
            continue
        for tid_s in tids:
            try:
                os.sched_setaffinity(int(tid_s), cpus)
                n += 1
            except OSError:
                continue
    return n
