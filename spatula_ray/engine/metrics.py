"""Crawl lineage/metrics accumulator.

A plain driver-side counter fed per wave by the distributed counting pass
(`driver._page_count_batch`): runner tasks never push to (or block on) a shared
stats actor — at cluster scale a single stats mailbox would serialize every
runner batch. Survives resume by initializing from the checkpoint manifest.
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
