"""Crawl lineage/metrics collector.

A single ``num_cpus=0`` actor accumulates per-batch counter deltas pushed by
the runner tasks (page statuses, emitted docs, fetch attempts). This keeps
end-of-crawl counters free — no extra Dataset executions over the page log —
and survives resume by initializing from the checkpoint manifest.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Optional


class CrawlStatsCollector:
    def __init__(self, initial: Optional[Dict[str, int]] = None):
        self.counts: Counter = Counter(
            {k: int(v) for k, v in (initial or {}).items()
             if isinstance(v, (int, float))})

    def add(self, delta: Dict[str, int]) -> None:
        self.counts.update(delta)

    def get(self) -> Dict[str, int]:
        return dict(self.counts)
