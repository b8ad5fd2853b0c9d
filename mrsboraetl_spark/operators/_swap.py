"""Crash rescue for the rename-aside atomic swap used by the persistent
incremental indexes (span_index, lsh_index, ann_index, stats_index).

The swap's commit sequence is ``os.replace(data, data.old)`` then
``os.replace(new, data)``.  A process crash BETWEEN the two replaces
leaves no data directory at all — the committed state sits intact at
``.old``.  Without rescue the next open would see ``is_empty()``, a
subsequent ingest would start a fresh table, and the following compact's
cleanup of ``.old`` would permanently delete the original corpus state
(the silent-data-loss chain the round-5 advisor flagged).

``rescue_orphan`` is the same recovery the engine's table writer does
(engine.py read_target): restore ``.old`` when the data path is missing.
It runs at index OPEN, before any is_empty / ingest / compact can
observe the orphaned state.  If both the data path and ``.old`` exist,
the crash happened after the second replace (commit complete) — the
``.old`` is stale garbage and the next compact's cleanup of it is safe.
"""

from __future__ import annotations

import os


def rescue_orphan(data_path: str) -> None:
    """Restore ``data_path`` from ``data_path + '.old'`` if a crashed
    swap left the data path missing but the old state intact."""
    old = data_path + ".old"
    if not os.path.exists(data_path) and os.path.exists(old):
        os.replace(old, data_path)
